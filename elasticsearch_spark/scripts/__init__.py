"""Scripting: the painless-expression-subset -> SQL transpiler.

Reference: modules/lang-painless (PainlessScriptEngine) — the default
script language everywhere a request carries ``"script": {...}``.
"""
from .expression import ExpressionError, compile_expression, expression_column
from .painless import (
    compile_painless, maybe_painless, painless_column, painless_execute,
    compile_painless_update, compile_painless_program, is_statement_script,
)

__all__ = ["compile_painless", "maybe_painless", "painless_column",
           "painless_execute", "compile_painless_update",
           "compile_painless_program", "is_statement_script",
           "compile_expression", "expression_column", "ExpressionError"]
