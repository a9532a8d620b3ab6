"""MinHashFilter transliteration parity — vectors ported from the
reference's own TestMinHashFilter.java."""

M64 = (1 << 64) - 1


def _u(x: int) -> int:
    return x & M64


def test_int_hash_vector():
    # TestMinHashFilter.testIntHash
    from lucene_spark.analysis.minhash import murmurhash3_x64_128

    v1, v2 = murmurhash3_x64_128((0).to_bytes(4, "big"))
    assert v1 == _u(-3485513579396041028)
    assert v2 == _u(6383328099726337777)


def test_string_hash_vector():
    # TestMinHashFilter.testStringHash
    from lucene_spark.analysis.minhash import murmurhash3_x64_128

    v1, v2 = murmurhash3_x64_128(
        "woof woof woof woof woof".encode("utf-16-le")
    )
    assert v1 == 7638079586852243959
    assert v2 == 4378804943379391304


def test_murmur_tail_lengths():
    """Every tail length 0..16 runs the right switch arm (sanity: no
    crashes, deterministic, distinct)."""
    from lucene_spark.analysis.minhash import murmurhash3_x64_128

    seen = set()
    for n in range(33):
        h = murmurhash3_x64_128(bytes(range(n)))
        assert h == murmurhash3_x64_128(bytes(range(n)))
        seen.add(h)
    assert len(seen) == 33


def _shingles(text: str, n: int = 5) -> list[str]:
    w = text.split()
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def test_two_hash_char_vectors():
    # TestMinHashFilter.testTokenStreamSingleInput second block:
    # createTokenStream(5, "woof woof woof woof woof", 2, 1, 1, false)
    from lucene_spark.analysis.minhash import min_hash_token_units

    units = min_hash_token_units(
        _shingles("woof woof woof woof woof"),
        hash_count=2,
        bucket_count=1,
        hash_set_size=1,
        with_rotation=False,
    )
    assert units == [
        (0, 0, 8449, 54077, 64133, 32857, 8605, 41409),
        (0, 1, 16887, 58164, 39536, 14926, 6529, 17276),
    ]


TEXT2 = "woof woof woof woof woof woof woof woof woof puff"


def test_token_count_matrix():
    # TestMinHashFilter.testTokenStream2-5
    from lucene_spark.analysis.minhash import min_hash_tokens

    sh = _shingles(TEXT2)
    assert len(sh) == 6
    assert len(min_hash_tokens(sh, 100, 1, 1, False)) == 100
    assert len(min_hash_tokens(sh, 10, 1, 10, False)) == 20
    assert len(min_hash_tokens(sh, 10, 10, 1, False)) == 20
    assert len(min_hash_tokens(sh, 10, 10, 1, True)) == 100
    toks5 = min_hash_tokens(sh, 1, 100, 1, False)
    assert len(toks5) == 2
    rot = min_hash_tokens(sh, 1, 100, 1, True)
    assert len(rot) == 100
    assert len(set(rot)) == 2


def test_empty_and_default_rotation():
    from lucene_spark.analysis.minhash import min_hash_tokens

    assert min_hash_tokens([]) == []
    # factory default: with_rotation = bucket_count > 1 -> every bucket
    # emits for a non-empty stream
    assert len(min_hash_tokens(["a"], 1, 8, 1)) == 8
    assert len(min_hash_tokens(["a"], 1, 1, 1)) == 1


def test_validation():
    import pytest

    from lucene_spark.analysis.minhash import min_hash_tokens

    with pytest.raises(ValueError):
        min_hash_tokens(["a"], 0, 1, 1)
    with pytest.raises(ValueError):
        min_hash_tokens(["a"], 1, 1, 0)
