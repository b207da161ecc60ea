"""Scripting: the painless-expression-subset -> SQL transpiler.

Reference: modules/lang-painless (PainlessScriptEngine) — the default
script language everywhere a request carries ``"script": {...}``.
"""
from .painless import (
    compile_painless, maybe_painless, painless_column, painless_execute,
)

__all__ = ["compile_painless", "maybe_painless", "painless_column",
           "painless_execute"]
