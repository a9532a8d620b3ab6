"""Snowball stemmers: Python translations of the reference's generated
org.tartarus.snowball programs (scripts/dev/translate_snowball.py), each
validated EXACTLY against vectors produced by the compiled reference
stemmer itself (scripts/dev/gen_snowball_vectors.py, ~500k pairs total;
tests/test_snowball.py).

``stem_fn(name)`` returns the (str) -> str dictionary-stage function for
DICT_STEMMERS; instances are cached per name (the string machine is
stateful but single-threaded within one Arrow batch — builder applies it
via a fresh ``stem_fn`` closure per partition anyway).
"""

from .runtime import Among, Lab, SnowballProgram, make_stem_fn

_CLASSES = {
    "danish": ("danish", "DanishStemmer"),
    "dutch": ("dutch", "DutchStemmer"),
    "romanian": ("romanian", "RomanianStemmer"),
    "catalan": ("catalan", "CatalanStemmer"),
    "lithuanian": ("lithuanian", "LithuanianStemmer"),
    "irish": ("irish", "IrishStemmer"),
    "armenian": ("armenian", "ArmenianStemmer"),
    "basque": ("basque", "BasqueStemmer"),
    "nepali": ("nepali", "NepaliStemmer"),
    "estonian": ("estonian", "EstonianStemmer"),
    "tamil": ("tamil", "TamilStemmer"),
    "turkish": ("turkish", "TurkishStemmer"),
    "serbian": ("serbian", "SerbianStemmer"),
    "english": ("english_sb", "EnglishStemmer"),  # Porter2
}

_FNS: dict = {}


def stemmer_class(name: str):
    import importlib

    mod, cls = _CLASSES[name]
    return getattr(
        importlib.import_module(f"lucene_spark.analysis.snowball.{mod}"), cls
    )


def stem_fn(name: str):
    """(str) -> str stemming function for the named Snowball language."""
    if name not in _FNS:
        _FNS[name] = make_stem_fn(stemmer_class(name))
    return _FNS[name]


SNOWBALL_LANGUAGES = tuple(sorted(_CLASSES))

__all__ = [
    "Among",
    "Lab",
    "SnowballProgram",
    "SNOWBALL_LANGUAGES",
    "make_stem_fn",
    "stem_fn",
    "stemmer_class",
]
