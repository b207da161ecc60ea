"""Stemmers for the English analysis chain.

Two stemmers, mirroring the reference's registration of `stemmer`
(porter) and lighter variants in
modules/analysis-common/.../CommonAnalysisPlugin.java:217 and the
StemmerTokenFilterFactory language table:

  - ``porter_stem``: the full Porter (1980) algorithm, implemented from
    the published rules (public domain). Used by the ``english``
    analyzer; golden-tested against the paper's example vectors.
  - ``s_stem``: a Harman-style "S stemmer" — a short SEQUENTIAL cascade
    of suffix rules, chosen because the identical cascade is expressible
    as nested ANSI-SQL regexp_replace calls (``s_stem_sql``), giving the
    ``english_light`` analyzer an exact DuckDB oracle twin.

Both are plain token->token functions; the analyzers vectorize them by
applying them once per UNIQUE token per batch (memoized — Zipf).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------
# S stemmer (Harman 1991 "How effective is suffixing?" style): rules are
# applied IN ORDER, each unconditionally (a sequential cascade, exactly
# like nested regexp_replace in SQL). Anchored patterns -> at most one
# replacement per rule, so Python re.sub == DuckDB regexp_replace.
# ---------------------------------------------------------------------
S_STEM_RULES: list[tuple[str, str]] = [
    (r"sses$", "ss"),             # caresses -> caress
    (r"([a-z])ies$", r"\1y"),     # ponies -> pony, queries -> query
    (r"([sx])es$", r"\1"),        # boxes -> box, buses -> bus
    (r"([cs]h)es$", r"\1"),       # churches -> church, crashes -> crash
    (r"([a-z][^aeiosux])es$", r"\1e"),  # files -> file, sizes -> size
    (r"([a-z][^aeious])s$", r"\1"),  # cats -> cat (keeps -ss/-us/vowel+s)
]

_S_COMPILED = [(re.compile(p), r) for p, r in S_STEM_RULES]


def s_stem(word: str) -> str:
    for pat, rep in _S_COMPILED:
        word = pat.sub(rep, word)
    return word


def s_stem_sql(expr: str) -> str:
    """Nested regexp_replace SQL applying the same cascade to ``expr``."""
    out = expr
    for pat, rep in S_STEM_RULES:
        sql_rep = rep.replace("\\1", "\\1")  # RE2 replacement syntax
        out = f"regexp_replace({out}, '{pat}', '{sql_rep}')"
    return out


def make_cascade_stemmer(rules: list[tuple[str, str]]):
    """Build a sequential regex-cascade stemmer (python fn) from rules.
    Every cascade built this way has an exact SQL twin via
    ``cascade_sql(rules, expr)`` — the same mechanism as the English
    S-stemmer, which is what makes these oracle-checkable."""
    compiled = [(re.compile(p), r) for p, r in rules]

    def stem(word: str) -> str:
        for pat, rep in compiled:
            word = pat.sub(rep, word)
        return word

    return stem


def cascade_sql(rules: list[tuple[str, str]], expr: str) -> str:
    # 'g' is required: DuckDB's regexp_replace replaces only the FIRST
    # match by default, while Python re.sub (the engine side) replaces
    # all — unanchored rules like the German umlaut maps diverge
    # without it ('überflüssig' has two umlauts).
    out = expr
    for pat, rep in rules:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


# Light stemmers for French / German in the style of Savoy's light
# stemming papers (and the reference's *_light stemmer registrations in
# StemmerTokenFilterFactory): short suffix cascades that normalize
# plural/feminine/case endings. These are documented approximations —
# they stem consistently (query and index side share the rules), which
# is the retrieval-relevant property; they do not claim Lucene
# rule-for-rule parity.
FRENCH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(..)eaux$", r"\1eau"),      # chevaux-style plurals: -eaux -> -eau
    (r"(...)aux$", r"\1al"),       # journaux -> journal
    (r"(....)ements?$", r"\1"),    # adverb/noun -ement(s)
    (r"(...)issements?$", r"\1"),  # -issement(s)
    (r"(..[^s])s$", r"\1"),        # plural -s (not after s)
    (r"(...)x$", r"\1"),           # plural -x
    (r"(...[^e])e$", r"\1"),       # feminine -e (not -ee)
]

GERMAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ä", "a"), (r"ö", "o"), (r"ü", "u"), (r"ß", "ss"),
    (r"(...)nen$", r"\1n"),        # -innen/-nen plurals
    (r"(...)en$", r"\1"),          # -en (plural / infinitive)
    (r"(...)er$", r"\1"),          # -er
    (r"(...)es$", r"\1"),          # -es
    (r"(...)e$", r"\1"),           # -e
    (r"(...)s$", r"\1"),           # genitive/plural -s
    (r"(...)n$", r"\1"),           # -n
]

french_light_stem = make_cascade_stemmer(FRENCH_LIGHT_RULES)
german_light_stem = make_cascade_stemmer(GERMAN_LIGHT_RULES)

# Light cascades for the next tier of the reference's language
# analyzers (AnalysisModule/CommonAnalysisPlugin *_light stemmer
# registrations; rule style after Savoy's light-stemming papers).
# Same caveat as French/German: documented approximations that stem
# query and index consistently; unanchored accent maps rely on
# cascade_sql's 'g' option for the SQL twins.
SPANISH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"á", "a"), (r"é", "e"), (r"í", "i"), (r"ó", "o"), (r"ú", "u"),
    (r"(..)ces$", r"\1z"),          # luces -> luz
    (r"(...)ciones$", r"\1cion"),   # canciones -> cancion
    (r"(..[aeiou])s$", r"\1"),      # vowel plurals: gatos -> gato
    (r"(...)[oae]$", r"\1"),        # final vowel: gato -> gat
]

ITALIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"à", "a"), (r"è", "e"), (r"é", "e"), (r"ì", "i"), (r"ò", "o"),
    (r"ù", "u"),
    (r"(...)zioni$", r"\1zione"),   # stazioni -> stazione
    (r"(...)[ieoa]$", r"\1"),       # plural / final vowel
]

PORTUGUESE_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ã", "a"), (r"õ", "o"), (r"á", "a"), (r"â", "a"), (r"é", "e"),
    (r"ê", "e"), (r"í", "i"), (r"ó", "o"), (r"ô", "o"), (r"ú", "u"),
    (r"ç", "c"),
    (r"(...)coes$", r"\1cao"),      # (folded) -ções -> -ção
    (r"(..)oes$", r"\1ao"),         # aviões -> avião
    (r"(..[^s])s$", r"\1"),         # plural -s (not after s)
    (r"(...)[aeo]$", r"\1"),        # final vowel
]

DUTCH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(...)heden$", r"\1heid"),    # mogelijkheden -> mogelijkheid
    (r"(...)(?:tje|je)$", r"\1"),   # diminutives: huisje -> huis
    (r"(...)en$", r"\1"),           # plural / infinitive
    (r"(..[^s])s$", r"\1"),         # plural -s
    (r"(...)e$", r"\1"),            # final -e: snelle -> snell
] + [
    # undouble trailing consonants (kolomm -> kolom); one rule per
    # letter because the DuckDB twin's RE2 has no backreferences
    (rf"(.){c}{c}$", rf"\1{c}") for c in "bdfgklmnprst"
]

spanish_light_stem = make_cascade_stemmer(SPANISH_LIGHT_RULES)
italian_light_stem = make_cascade_stemmer(ITALIAN_LIGHT_RULES)
portuguese_light_stem = make_cascade_stemmer(PORTUGUESE_LIGHT_RULES)
dutch_light_stem = make_cascade_stemmer(DUTCH_LIGHT_RULES)

# Scandinavian / Finnish / Russian tier (the reference registers
# swedish/norwegian/danish/finnish/russian analyzers with *_light
# stemmer variants; cascades after Savoy's light stemmers for the
# Nordic languages and the common case-suffix strip for Russian).
SWEDISH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"å", "a"), (r"ä", "a"), (r"ö", "o"),
    (r"(...)(?:arna|erna|orna)$", r"\1"),  # definite plurals
    (r"(...)(?:ande|ende)$", r"\1"),       # participles
    (r"(...)(?:ar|er|or)$", r"\1"),        # plurals
    (r"(...)(?:en|et|na)$", r"\1"),        # definite singular
    (r"(...)(?:t|n|a|e|s)$", r"\1"),       # residual endings
]

NORWEGIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"å", "a"), (r"æ", "a"), (r"ø", "o"),
    (r"(...)(?:ene|ane|ande|ende)$", r"\1"),  # definite plural / part.
    (r"(...)(?:er|ar|st)$", r"\1"),
    (r"(...)(?:en|et|a|e|s)$", r"\1"),
]

DANISH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"å", "a"), (r"æ", "a"), (r"ø", "o"),
    (r"(...)(?:erne|ende)$", r"\1"),       # definite plurals
    (r"(...)(?:ere|est)$", r"\1"),         # comparatives
    (r"(...)(?:er|en|et|es)$", r"\1"),
    (r"(...)(?:e|s)$", r"\1"),
]

FINNISH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ä", "a"), (r"ö", "o"),
    (r"(...)(?:issa|ista|illa|ilta|ille|ihin)$", r"\1"),  # plural cases
    (r"(...)(?:ssa|sta|lla|lta|lle|ksi|tta)$", r"\1"),    # sg cases
    (r"(...)(?:iden|ien|jen)$", r"\1"),                   # plural gen.
    (r"(...)(?:t|n|a)$", r"\1"),                          # residuals
]

RUSSIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ё", "е"),
    (r"(...)(?:иями|ями|ами)$", r"\1"),               # instr. plurals
    (r"(...)(?:иях|иям|ием|ого|его|ому|ему)$", r"\1"),  # adj/gen
    (r"(...)(?:ой|ый|ий|ая|яя|ое|ее|ов|ев|ей|ам|ям|ах|ях|ию|ья|ье)$",
     r"\1"),
    (r"(...)(?:ы|и|а|я|о|е|у|ю|ь)$", r"\1"),          # single-vowel
]

swedish_light_stem = make_cascade_stemmer(SWEDISH_LIGHT_RULES)
norwegian_light_stem = make_cascade_stemmer(NORWEGIAN_LIGHT_RULES)
danish_light_stem = make_cascade_stemmer(DANISH_LIGHT_RULES)
finnish_light_stem = make_cascade_stemmer(FINNISH_LIGHT_RULES)
russian_light_stem = make_cascade_stemmer(RUSSIAN_LIGHT_RULES)

# Arabic / Turkish / Greek / Czech / Romanian tier (reference registers
# arabic/turkish/greek/czech/romanian analyzers in AnalysisModule +
# CommonAnalysisPlugin; cascades after the published light stemmers:
# Larkey's Arabic light10, Savoy's light stemmers for Greek/Czech/
# Romanian, and a suffix-strip for Turkish's most common noun
# morphology). Same engineering property as the other tiers: every
# rule is a regex pair, so cascade_sql gives an exact DuckDB twin.
ARABIC_LIGHT_RULES: list[tuple[str, str]] = [
    (r"[ً-ْٰ]", ""),      # tashkeel diacritics + dagger alif
    (r"[أإآٱ]", "ا"),                     # alef variants -> bare alef
    (r"ى", "ي"), (r"ة", "ه"),             # alef maqsura / ta marbuta
    # light10 prefixes: definite article (+clitics), waw only when >= 3
    # letters remain
    (r"^(?:وال|بال|كال|فال)(..+)$", r"\1"),
    (r"^(?:ال|لل)(..+)$", r"\1"),
    (r"^و(...+)$", r"\1"),
    # light10 suffixes
    (r"(..)(?:ها|ان|ات|ون|ين|يه|ية)$", r"\1"),
    (r"(..)[هةي]$", r"\1"),
]

TURKISH_LIGHT_RULES: list[tuple[str, str]] = [
    # outer-to-inner (kitap-lar-dan): case/possessive first, plural
    # second, so one cascade pass unwinds the common two-suffix stack
    (r"(...)(?:nın|nin|nun|nün|dan|den|tan|ten)$", r"\1"),  # gen./abl.
    (r"(...)(?:da|de|ta|te|ın|in|un|ün|sı|si|su|sü)$", r"\1"),  # loc/poss
    (r"(...)(?:lar|ler)$", r"\1"),               # plural
    (r"(...)[ıiuüaeoö]$", r"\1"),                # residual vowel
]

GREEK_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ς", "σ"),                                  # final sigma
    (r"ά", "α"), (r"έ", "ε"), (r"ή", "η"), (r"ί", "ι"),
    (r"ό", "ο"), (r"ύ", "υ"), (r"ώ", "ω"),        # tonos fold
    (r"(...)(?:ματα|ματοσ|ουμε|ουνε)$", r"\1"),
    (r"(...)(?:εισ|ουν|ουσ|ων|εσ|οι|ου)$", r"\1"),
    (r"(...)(?:οσ|ησ|ασ|α|η|ο|ε|ι)$", r"\1"),
]

CZECH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"á", "a"), (r"é", "e"), (r"í", "i"), (r"ó", "o"), (r"ú", "u"),
    (r"ů", "u"), (r"ý", "y"), (r"ě", "e"), (r"č", "c"), (r"ř", "r"),
    (r"š", "s"), (r"ž", "z"), (r"ť", "t"), (r"ď", "d"), (r"ň", "n"),
    (r"(...)(?:atech|atum)$", r"\1"),             # neuter -at- paradigm
    (r"(...)(?:ech|ich|ach|ych|ami|emi|imi|ata|ova|ove|ovi)$", r"\1"),
    (r"(...)(?:em|im|am|um|ou|eho|emu|ym|ej)$", r"\1"),
    (r"(...)[aeiouy]$", r"\1"),
]

ROMANIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ă", "a"), (r"â", "a"), (r"î", "i"),
    (r"[șş]", "s"), (r"[țţ]", "t"),               # both cedilla forms
    (r"(...)(?:urile|ilor|ului|elor|easca)$", r"\1"),
    (r"(...)(?:ile|uri|ele|iei|iile|ii|ul|ea|le)$", r"\1"),
    (r"(...)[aeiu]$", r"\1"),
]

arabic_light_stem = make_cascade_stemmer(ARABIC_LIGHT_RULES)
turkish_light_stem = make_cascade_stemmer(TURKISH_LIGHT_RULES)
greek_light_stem = make_cascade_stemmer(GREEK_LIGHT_RULES)
czech_light_stem = make_cascade_stemmer(CZECH_LIGHT_RULES)
romanian_light_stem = make_cascade_stemmer(ROMANIAN_LIGHT_RULES)

# Hungarian / Bulgarian / Hindi / Persian / Indonesian tier (reference
# registers hungarian/bulgarian/hindi/persian/indonesian analyzers;
# cascades after the published light stemmers: Savoy for hu/bg,
# Ramanathan & Rao's Hindi suffix list, Lucene's PersianNormalizer
# (normalization-only language) + common plural/comparative strips,
# and the Tala Indonesian stemmer's highest-frequency affixes).
HUNGARIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"á", "a"), (r"é", "e"), (r"í", "i"), (r"ó", "o"), (r"ö", "o"),
    (r"ő", "o"), (r"ú", "u"), (r"ü", "u"), (r"ű", "u"),
    (r"(...)(?:okat|eket|akat|aknak|eknek)$", r"\1"),  # plural+case
    (r"(...)(?:nak|nek|ban|ben|bol|val|vel|hoz|hez|rol|tol|nal|nel)$",
     r"\1"),                                           # case suffixes
    (r"(...)(?:ok|ek|ak|at|et|ot|ra|re|ba|be)$", r"\1"),
    (r"(...)[aeout]$", r"\1"),                         # residuals
]

BULGARIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(...)(?:ията|ият|ите|ове|ета)$", r"\1"),  # def. plural forms
    (r"(...)(?:ът|ят|та|то|те)$", r"\1"),        # definite articles
    (r"(...)[аиое]$", r"\1"),                    # residual vowels
]

HINDI_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(..)(?:ियों|ियाँ|ाओं|ाएं)$", r"\1"),      # oblique/fem plurals
    (r"(..)(?:ों|ें|ीय|ता|ने|ना)$", r"\1"),       # case/infinitive
    (r"(..)[ीेाो]$", r"\1"),                     # final matras
]

PERSIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ي", "ی"), (r"ك", "ک"),                    # arabic -> farsi forms
    (r"‌", ""),                              # ZWNJ fold
    (r"(..)(?:هایی|های|ها)$", r"\1"),            # plurals
    (r"(..)(?:ترین|تر)$", r"\1"),                # comparatives
]

INDONESIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"^(?:meng|meny|mem|men|ber|di|ke|per|pe)(..+)$", r"\1"),  # prefixes
    (r"(..)(?:nya|kan|an)$", r"\1"),             # suffixes
    (r"(...)i$", r"\1"),
]

hungarian_light_stem = make_cascade_stemmer(HUNGARIAN_LIGHT_RULES)
bulgarian_light_stem = make_cascade_stemmer(BULGARIAN_LIGHT_RULES)
hindi_light_stem = make_cascade_stemmer(HINDI_LIGHT_RULES)
persian_light_stem = make_cascade_stemmer(PERSIAN_LIGHT_RULES)
indonesian_light_stem = make_cascade_stemmer(INDONESIAN_LIGHT_RULES)

# Final tier — the remaining languages of the reference's analyzer
# table (modules/analysis-common/.../CommonAnalysisPlugin.java:170-217
# registers armenian/basque/bengali/brazilian/catalan/estonian/galician/
# irish/latvian/lithuanian/sorani alongside the ones above; thai is
# segmentation-only and lives in analyzers.py). Cascades follow the
# same published-light-stemmer style (Savoy for the Romance/Baltic
# group, Lucene's SoraniNormalizer normalization rules for Kurdish,
# a case-suffix strip for the agglutinative ones); each rule is a
# (pattern, replacement) regex pair so cascade_sql gives every stemmer
# an exact DuckDB twin.
BRAZILIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ã", "a"), (r"õ", "o"), (r"á", "a"), (r"â", "a"), (r"é", "e"),
    (r"ê", "e"), (r"í", "i"), (r"ó", "o"), (r"ô", "o"), (r"ú", "u"),
    (r"ç", "c"),
    (r"(..)(?:coes|cao)$", r"\1c"),   # -ções/-ção (folded) share a stem
    (r"(..)oes$", r"\1ao"),           # aviões -> aviao
    (r"(...)(?:eiro|eira)$", r"\1"),  # agentives: brasileiro -> brasil
    (r"(...)(?:mente)$", r"\1"),      # adverbs
    (r"(..[^s])s$", r"\1"),           # plural -s (not after s)
    (r"(...)[aeo]$", r"\1"),          # final vowel
]

CATALAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"à", "a"), (r"è", "e"), (r"é", "e"), (r"í", "i"), (r"ï", "i"),
    (r"ò", "o"), (r"ó", "o"), (r"ú", "u"), (r"ü", "u"), (r"ç", "c"),
    (r"(...)(?:cions|cio)$", r"\1cio"),  # nacions/nacio share a stem
    (r"(..)(?:ques|qua|que)$", r"\1c"),  # -ques -> -c (bibliotec-)
    (r"(...)(?:es|os|is)$", r"\1"),      # plurals: cases -> cas
    (r"(..[^s])s$", r"\1"),              # plural -s
    (r"(...)[aeo]$", r"\1"),             # final vowel
]

GALICIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"á", "a"), (r"é", "e"), (r"í", "i"), (r"ó", "o"), (r"ú", "u"),
    (r"ñ", "n"),
    (r"(..)(?:cions|cion|zons|zon)$", r"\1z"),  # nacións/nación
    (r"(..)ns$", r"\1n"),               # cans -> can
    (r"(...)(?:eiro|eira)$", r"\1"),    # agentives
    (r"(...)(?:es|is)$", r"\1"),        # plurals
    (r"(..[^s])s$", r"\1"),
    (r"(...)[aeo]$", r"\1"),
]

BASQUE_LIGHT_RULES: list[tuple[str, str]] = [
    # agglutinative case stack, outer-to-inner: local/genitive plurals
    # first, then singular cases, then the article
    (r"(...)(?:etako|etara|etatik|engatik|arentzat)$", r"\1"),
    (r"(...)(?:aren|etan|ekin|entzat|gatik|raino)$", r"\1"),
    (r"(...)(?:ean|era|tik|ari|ek|en|an|az)$", r"\1"),
    (r"(...)(?:ak|a|k)$", r"\1"),       # article / absolutive plural
]

IRISH_LIGHT_RULES: list[tuple[str, str]] = [
    # initial mutations (Lucene IrishLowerCaseFilter + snowball handle
    # these): eclipsis clusters, then h-/t-/n- prothesis before vowels
    (r"^(?:bhf|mb|gc|nd|ng|bp|dt)(.+)$", r"\1"),
    (r"^[htn]-?([aeiouáéíóú].+)$", r"\1"),
    (r"á", "a"), (r"é", "e"), (r"í", "i"), (r"ó", "o"), (r"ú", "u"),
    (r"(...)(?:eacha|anna|acha)$", r"\1"),  # plurals
    (r"(...)(?:ai|ta|te|a|e|i)$", r"\1"),   # residual endings
]

ESTONIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ä", "a"), (r"ö", "o"), (r"ü", "u"), (r"õ", "o"), (r"š", "s"),
    (r"ž", "z"),
    (r"(...)(?:dele|delt|dest|desse|tele|telt|test|tesse)$", r"\1"),
    (r"(...)(?:des|tes|sse|st|le|lt|ga|ks|ni|na|ta)$", r"\1"),
    (r"(...)(?:de|te|id)$", r"\1"),     # plural genitive/partitive
    (r"(...)[dt]$", r"\1"),             # plural -d / partitive -t
]

LATVIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ā", "a"), (r"ē", "e"), (r"ī", "i"), (r"ū", "u"), (r"č", "c"),
    (r"ģ", "g"), (r"ķ", "k"), (r"ļ", "l"), (r"ņ", "n"), (r"š", "s"),
    (r"ž", "z"),
    (r"(...)(?:ajiem|ajam|ajai|ajas)$", r"\1"),  # definite adjectives
    (r"(...)(?:iem|iet|ies|am|em|im|um|os|us|as|es|is)$", r"\1"),
    (r"(...)[aeisu]$", r"\1"),
]

LITHUANIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"ą", "a"), (r"ę", "e"), (r"ė", "e"), (r"į", "i"), (r"ų", "u"),
    (r"ū", "u"), (r"č", "c"), (r"š", "s"), (r"ž", "z"),
    (r"(...)(?:iams|ams|oms|ems|ose|uose|ais|iais|omis|emis)$", r"\1"),
    (r"(...)(?:ai|as|os|us|is|ys|es|io|iu|ia)$", r"\1"),
    (r"(...)[aeiouy]$", r"\1"),
]

ARMENIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"եւ", "և"),                         # ligature normalization
    (r"(...)(?:ներում|ներին|ների|ները|ներով|ներ)$", r"\1"),  # plurals
    (r"(...)(?:ությունը|ության|ություն)$", r"\1"),  # -ություն nouns
    (r"(...)(?:ում|ից|ով|ին|եր|եմ|ենք)$", r"\1"),  # case/verb endings
    (r"(...)[ընիե]$", r"\1"),             # article/residual
]

SORANI_LIGHT_RULES: list[tuple[str, str]] = [
    # SoraniNormalizer character folds (Lucene analysis/ckb): unify
    # yeh/kaf forms, final-form heh, strip ZWNJ + Arabic diacritics
    (r"ي", "ی"), (r"ى", "ی"), (r"ك", "ک"), (r"ه‌", "ە"),
    (r"‌", ""),                       # ZWNJ
    (r"[ً-ْ]", ""),        # harakat
    (r"(..)(?:ەکانی|ەکان|ەکەی|ەکە)$", r"\1"),   # definite (+izafe)
    (r"(..)(?:انە|ێکی|ێک|ان|ەوە|دا|تان|مان)$", r"\1"),
    (r"(..)[یە]$", r"\1"),                       # izafe / final vowel
]

BENGALI_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(..)(?:গুলোতে|গুলিতে|গুলোর|গুলির|গুলো|গুলি)$", r"\1"),  # plurals
    (r"(..)(?:দেরকে|দের|রা|কে|তে|ের|েরা)$", r"\1"),  # case endings
    (r"(..)(?:টি|টা|খানা|জন)$", r"\1"),              # classifiers
    (r"(..)[ের]$", r"\1"),                           # residual
]

# Polish (reference plugins/analysis-stempel registers the `polish`
# analyzer; this is a light-cascade analogue of its statistical
# stemmer's most common inflection classes) and Ukrainian
# (plugins/analysis-ukrainian UkrainianAnalyzerProvider).
POLISH_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(...)(?:iach|iami|iom|ach|ami|om)$", r"\1"),   # noun plural cases
    (r"(...)(?:ego|emu|ych|ich|ej|ym|im|ów)$", r"\1"),  # adjective cases
    (r"(...)(?:ie|ią|ię|ia|iu)$", r"\1"),             # soft-stem cases
    (r"(...)(?:y|i|e|a|o|u|ą|ę)$", r"\1"),            # single-vowel
]

UKRAINIAN_LIGHT_RULES: list[tuple[str, str]] = [
    (r"(...)(?:ами|ями|ові|еві|ого|ому|ими|іми)$", r"\1"),  # instr/dat/gen
    (r"(...)(?:ах|ях|ам|ям|ій|ий|ої|ою|ею|их|іх|ів|їв)$", r"\1"),
    (r"(...)(?:а|я|о|е|у|ю|и|і|ї|ь)$", r"\1"),        # single-vowel
]

brazilian_light_stem = make_cascade_stemmer(BRAZILIAN_LIGHT_RULES)
catalan_light_stem = make_cascade_stemmer(CATALAN_LIGHT_RULES)
galician_light_stem = make_cascade_stemmer(GALICIAN_LIGHT_RULES)
basque_light_stem = make_cascade_stemmer(BASQUE_LIGHT_RULES)
irish_light_stem = make_cascade_stemmer(IRISH_LIGHT_RULES)
estonian_light_stem = make_cascade_stemmer(ESTONIAN_LIGHT_RULES)
latvian_light_stem = make_cascade_stemmer(LATVIAN_LIGHT_RULES)
lithuanian_light_stem = make_cascade_stemmer(LITHUANIAN_LIGHT_RULES)
armenian_light_stem = make_cascade_stemmer(ARMENIAN_LIGHT_RULES)
sorani_light_stem = make_cascade_stemmer(SORANI_LIGHT_RULES)
bengali_light_stem = make_cascade_stemmer(BENGALI_LIGHT_RULES)
polish_light_stem = make_cascade_stemmer(POLISH_LIGHT_RULES)
ukrainian_light_stem = make_cascade_stemmer(UKRAINIAN_LIGHT_RULES)


# ---------------------------------------------------------------------
# Porter stemmer (Porter 1980, "An algorithm for suffix stripping")
# ---------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences ([C](VC)^m[V])."""
    m = 0
    prev_c = None
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if prev_c is True and c is False:
            pass
        if prev_c is False and c is True:
            m += 1
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    if (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return word[-1] not in "wxy"
    return False


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    if len(word) <= 2 or not word.isascii() or not word.isalpha():
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4 ("ion" handled separately: requires the stem to end s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion"):
            stem = w[:-3]
            if _measure(stem) > 1 and stem.endswith(("s", "t")):
                w = stem

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
