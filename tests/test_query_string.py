from elasticsearch_spark.search.query_string import parse_query_string as p


def test_single_term():
    assert p("foo") == {"match": {"text": {"query": "foo"}}}


def test_default_or():
    out = p("foo bar")
    assert out["bool"]["minimum_should_match"] == 1
    assert len(out["bool"]["should"]) == 2


def test_and():
    out = p("foo AND bar")
    assert out == {"bool": {"must": [
        {"match": {"text": {"query": "foo"}}},
        {"match": {"text": {"query": "bar"}}},
    ]}}


def test_not_and_minus():
    assert p("NOT foo") == {"bool": {"must_not": [{"match": {"text": {"query": "foo"}}}]}}
    assert p("-foo") == {"bool": {"must_not": [{"match": {"text": {"query": "foo"}}}]}}


def test_field_and_phrase():
    assert p('lang:en') == {"match": {"lang": {"query": "en"}}}
    assert p('"big data"') == {"match_phrase": {"text": {"query": "big data"}}}
    assert p('title:"big data"') == {"match_phrase": {"title": {"query": "big data"}}}


def test_prefix_wildcard_regex_fuzzy():
    assert p("foo*") == {"prefix": {"text": {"value": "foo"}}}
    assert p("f?o*") == {"wildcard": {"text": {"value": "f?o*"}}}
    assert p("/ab+c/") == {"regexp": {"text": {"value": "ab+c"}}}
    assert p("foo~1") == {"fuzzy": {"text": {"value": "foo", "fuzziness": 1}}}
    assert p("foo~") == {"fuzzy": {"text": {"value": "foo", "fuzziness": 2}}}


def test_range():
    assert p("n:[1 TO 5]") == {"range": {"n": {"gte": 1, "lte": 5}}}
    assert p("n:{1 TO 5}") == {"range": {"n": {"gt": 1, "lt": 5}}}
    assert p("n:[10 TO *]") == {"range": {"n": {"gte": 10}}}


def test_boost():
    assert p("foo^2.5") == {"match": {"text": {"query": "foo", "boost": 2.5}}}


def test_parens_and_mixed():
    out = p("(foo OR bar) AND NOT lang:zh")
    assert out["bool"]["must"][0]["bool"]["minimum_should_match"] == 1
    assert out["bool"]["must_not"] == [{"match": {"lang": {"query": "zh"}}}]


def test_and_not_same_level():
    out = p("table AND scan NOT lang:zh")
    assert out["bool"]["must"] == [
        {"match": {"text": {"query": "table"}}},
        {"match": {"text": {"query": "scan"}}},
    ]
    assert out["bool"]["must_not"] == [{"match": {"lang": {"query": "zh"}}}]


def test_mixed_and_or():
    out = p("a b AND c")
    assert out["bool"]["must"] == [
        {"match": {"text": {"query": "b"}}},
        {"match": {"text": {"query": "c"}}},
    ]
    assert out["bool"]["should"] == [{"match": {"text": {"query": "a"}}}]
    assert out["bool"]["minimum_should_match"] == 0
