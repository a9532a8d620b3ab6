"""SimpleQueryParser behavioral port of the reference's
TestSimpleQueryParser cases (queryparser/.../simple/TestSimpleQueryParser
.java; default operator MUST like the reference's helper).  Cases whose
expectations depend on MockAnalyzer keeping punctuation inside terms
(escape-literal terms like ``st*ar\\*``) are adapted or skipped — our
tokenizer is the engine's standard chain; the PARSER behavior (operator
handling, garbage degradation) is what is asserted."""

import pytest

from lucene_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_spark.search.simpleparser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    SimpleQueryParser,
)


def parse(text, flags=None):
    kw = {"default_operator": "MUST"}
    if flags is not None:
        kw["flags"] = flags
    return SimpleQueryParser(**kw).parse(text)


def must(*qs):
    return BooleanQuery.of(*[(q, Occur.MUST) for q in qs])


def should(*qs):
    return BooleanQuery.of(*[(q, Occur.SHOULD) for q in qs])


def negated(q):
    return BooleanQuery.of((q, Occur.MUST_NOT), (MatchAllDocsQuery(), Occur.SHOULD))


def test_term():
    assert parse("foobar") == TermQuery("foobar")


def test_fuzzy():
    expected = FuzzyQuery("foobar", max_edits=2)
    assert parse("foobar~2") == expected
    assert parse("foobar~") == expected
    assert parse("foobar~a") == TermQuery("foobar")
    assert parse("foobar~1a") == TermQuery("foobar")
    # above the max supported distance: clamp to 2
    assert parse("foo~3 bar") == must(FuzzyQuery("foo", max_edits=2), TermQuery("bar"))


def test_phrase():
    assert parse('"foo bar"') == PhraseQuery(("foo", "bar"))


def test_phrase_with_slop():
    assert parse('"foo bar"~2') == PhraseQuery(("foo", "bar"), slop=2)
    assert parse('"foo bar"~10') == PhraseQuery(("foo", "bar"), slop=10)
    assert parse('"foo bar"~') == PhraseQuery(("foo", "bar"))
    assert parse('"foo bar"~a') == PhraseQuery(("foo", "bar"))
    assert parse('"foo bar"~1a') == PhraseQuery(("foo", "bar"))
    assert parse('"foo bar"~-1') == PhraseQuery(("foo", "bar"))
    assert parse('"foo bar"~12 baz') == must(
        PhraseQuery(("foo", "bar"), slop=12), TermQuery("baz")
    )


def test_prefix():
    assert parse("foobar*") == PrefixQuery("foobar")


def test_crazy_prefixes():
    # multiple asterisks: only the trailing one is the operator
    assert parse("st*ar*") == PrefixQuery("st*ar")


def test_and():
    assert parse("this+that") == must(TermQuery("this"), TermQuery("that"))


def test_and_phrase():
    assert parse('"this there"+"that here"') == must(
        PhraseQuery(("this", "there")), PhraseQuery(("that", "here"))
    )


def test_and_implicit():
    assert parse("this that the") == must(
        TermQuery("this"), TermQuery("that"), TermQuery("the")
    )


def test_or():
    assert parse("this|that") == should(TermQuery("this"), TermQuery("that"))
    op = SimpleQueryParser()  # default operator OR
    assert op.parse("this that") == should(TermQuery("this"), TermQuery("that"))


def test_or_phrase():
    assert parse('"this there"|"that here"') == should(
        PhraseQuery(("this", "there")), PhraseQuery(("that", "here"))
    )


def test_not():
    expected = negated(TermQuery("foo"))
    assert parse("-foo") == expected
    assert parse("-(foo)") == expected
    assert parse("---foo") == expected


def test_garbage_term():
    expected = TermQuery("star")
    for s in ("star", "star\n", "star\r", "star\t", "star(", "star)",
              'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\'):
        assert parse(s) == expected, repr(s)


def test_garbage_empty():
    for s in ("", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "',
              '(" "|" ")', '" " " "', '(" " " ")'):
        assert parse(s) == MatchNoDocsQuery(), repr(s)


def test_garbage_and():
    expected = must(TermQuery("star"), TermQuery("wars"))
    for s in ("star wars", "star+wars", "     star     wars   ",
              "     star +    wars   ", "  |     star + + |   wars   ",
              "  |     star + + |   wars   \\"):
        assert parse(s) == expected, repr(s)


def test_garbage_or():
    expected = should(TermQuery("star"), TermQuery("wars"))
    for s in ("star|wars", "     star |    wars   ",
              "  |     star | + |   wars   ", "  +     star | + +   wars   \\"):
        assert parse(s) == expected, repr(s)


def test_garbage_not():
    expected = negated(TermQuery("star"))
    for s in ("-star", "---star", "- -star -"):
        assert parse(s) == expected, repr(s)


def test_garbage_phrase():
    expected = PhraseQuery(("star", "wars"))
    for s in ('"star wars"', '"star wars\\ "', '"" | "star wars"',
              '          "star wars"        ""\\'):
        assert parse(s) == expected, repr(s)


def test_garbage_subquery():
    expected = TermQuery("star")
    for s in ("(star)", "(star))", "((star)", "     -()(star)        \n\n\r     ",
              "| + - ( + - |      star    \n      ) \n"):
        assert parse(s) == expected, repr(s)


def test_compound_and():
    expected = must(TermQuery("star"), TermQuery("wars"), TermQuery("empire"))
    for s in ("star wars empire", "star+wars + empire", " | --star wars empire \n\\"):
        assert parse(s) == expected, repr(s)


def test_compound_or():
    expected = should(TermQuery("star"), TermQuery("wars"), TermQuery("empire"))
    for s in ("star|wars|empire", "star|wars | empire", " | --star|wars|empire \n\\"):
        assert parse(s) == expected, repr(s)


def test_complex00():
    expected = must(
        should(TermQuery("star"), TermQuery("wars")), TermQuery("empire")
    )
    for s in ("star|wars empire", "star|wars + empire", "star| + wars + ----empire |"):
        assert parse(s) == expected, repr(s)


def test_complex01():
    # (star wars) | empire
    expected = should(
        must(TermQuery("star"), TermQuery("wars")), TermQuery("empire")
    )
    assert parse("star wars | empire") == expected
    assert parse("star + wars |empire") == expected


def test_match_all_and_empty():
    assert parse("*") == MatchAllDocsQuery()
    assert parse(" * ") == MatchAllDocsQuery()
    assert parse("") == MatchNoDocsQuery()


def test_disable_operators():
    # phrase disabled: quotes are token characters (our analyzer strips
    # them, so the two words become an AND pair)
    q = parse('"test"', flags=AND_OPERATOR | OR_OPERATOR)
    assert q == TermQuery("test")
    # prefix disabled: trailing * is part of the token (stripped by chain)
    assert parse("test*", flags=PHRASE_OPERATOR) == TermQuery("test")
    # AND disabled: '+' is a token char (chain splits around it)
    assert parse("test+that", flags=OR_OPERATOR) == must(
        TermQuery("test"), TermQuery("that")
    )
    # NOT disabled: '-' is a token char
    assert parse("-test", flags=PHRASE_OPERATOR) == TermQuery("test")
    # precedence disabled
    assert parse("(test)", flags=AND_OPERATOR) == TermQuery("test")


def test_with_synonyms():
    from lucene_spark.search.query import SynonymQuery
    from lucene_spark.search.querybuilder import QueryTimeSynonyms

    p = SimpleQueryParser(
        synonyms=QueryTimeSynonyms([("fast", "quick")]), default_operator="MUST"
    )
    assert p.parse("fast car") == must(
        SynonymQuery(("fast", "quick")), TermQuery("car")
    )


def test_never_raises_fuzz():
    import random

    rng = random.Random(7)
    alphabet = 'ab |+-()"~*\\\t\n'
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25)))
        q = SimpleQueryParser(default_operator="MUST").parse(s)
        assert q is not None
