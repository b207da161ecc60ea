import pandas as pd

from elasticsearch_spark.analysis import analyze, analyze_batch


def test_standard_basic():
    assert analyze("Hello, World!") == [("hello", 0), ("world", 1)]


def test_standard_underscore_joins():
    # UAX#29 ExtendNumLet: '_' joins words (Lucene standard keeps foo_bar)
    assert analyze("foo_bar baz") == [("foo_bar", 0), ("baz", 1)]


def test_standard_max_token_length():
    tok = "a" * 600
    out = analyze(tok)
    assert [t for t, _ in out] == ["a" * 255, "a" * 255, "a" * 90]
    assert [p for _, p in out] == [0, 1, 2]


def test_code_camel_case():
    out = analyze("getFooBar", "code")
    terms = [t for t, _ in out]
    positions = [p for _, p in out]
    assert terms == ["getfoobar", "get", "foo", "bar"]
    assert positions == [0, 0, 0, 0]  # sub-tokens overlap the original


def test_code_snake_and_digits():
    out = analyze("read_buf2Cache x", "code")
    terms = [t for t, _ in out]
    assert terms == ["read_buf2cache", "read", "buf", "2", "cache", "x"]
    assert [p for _, p in out] == [0, 0, 0, 0, 0, 1]


def test_code_no_dup_subtoken():
    out = analyze("foo", "code")
    assert out == [("foo", 0)]


def test_stop_preserves_positions():
    out = analyze("the quick fox", "stop")
    assert out == [("quick", 1), ("fox", 2)]


def test_whitespace_keeps_case():
    assert analyze("Foo BAR", "whitespace") == [("Foo", 0), ("BAR", 1)]


def test_keyword():
    assert analyze("One Two", "keyword") == [("One Two", 0)]


def test_ascii_word_matches_sql_regex():
    # ascii_word must equal regexp_extract_all(lower(x), '[a-z0-9_]+')
    import duckdb
    import re

    texts = ["Hello, World!", "foo_bar2 Baz-Qux", "a  b\tc", "éclair naïve", ""]
    con = duckdb.connect()
    for t in texts:
        ours = [x for x, _ in analyze(t, "ascii_word")]
        theirs = con.execute(
            "select regexp_extract_all(lower(?), '[a-z0-9_]+')", [t]
        ).fetchone()[0]
        assert ours == theirs, t


def test_batch_equals_single():
    texts = pd.Series(["Hello World", None, "getFooBar baz_qux"])
    terms, positions = analyze_batch(texts, "code")
    for i, text in enumerate(texts.fillna("")):
        expected = analyze(text, "code")
        assert list(zip(terms[i], positions[i])) == expected
