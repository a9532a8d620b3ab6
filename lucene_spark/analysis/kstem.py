"""KStem — Bob Krovetz' dictionary-assisted morphological stemmer.

Faithful transliteration of the reference implementation
(analysis/common/src/java/org/apache/lucene/analysis/en/KStemmer.java,
itself derived from the CIIR UMass Amherst java version of Krovetz'
kstem; see "Viewing Morphology as an Inference Process", Krovetz,
SIGIR 1993).  The head-word dictionary (KStemData1..8.java, 27,495
words from head_word_list.txt) is vendored as
``data/kstem_words.txt.gz``; the small exception / direct-conflation /
nationality / supplement / proper-noun tables below are the
KStemmer.java:75-588 literals — the rule tables and the traversal order
of the ending routines ARE the stemming contract, so they transliterate
verbatim (same adjudication as the light stemmers in
lucene_spark/analysis/lang.py).

Parity: tests/test_kstem.py replays the reference's own 14k-word
vector archive (analysis/common/src/test/.../kstemTestData.zip) —
exact match required.

Engine integration: like Porter, KStem is a *dictionary-stage* stemmer
(DICT_STEMMERS in analyzer.py) — the IndexBuilder applies it to the
DISTINCT TERM DICTIONARY as one Arrow batch (builder.apply_dict_stemmer),
never per token, so the per-call Python cost is O(|vocab|), not O(corpus).
Input contract (KStemFilter.java:33): terms must already be lowercased.
"""

from __future__ import annotations

import gzip
import os

MAX_WORD_LEN = 50

# KStemmer.java:75-117 — words that should not be stemmed further even
# though an ending routine would find a shorter dictionary root.
_EXCEPTION_WORDS = [
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane",
    "mare", "nape", "node", "pane", "pate", "plane", "pope",
    "programme", "quite", "ripe", "rote", "rune", "sage", "severe",
    "shoppe", "sine", "slime", "snipe", "steppe", "suite", "swinge",
    "tare", "tine", "tope", "tripe", "twine",
]

# KStemmer.java:119-160 — irregular forms mapped directly to their root.
_DIRECT_CONFLATIONS = [
    ("aging", "age"), ("going", "go"), ("goes", "go"), ("lying", "lie"),
    ("using", "use"), ("owing", "owe"), ("suing", "sue"), ("dying", "die"),
    ("tying", "tie"), ("vying", "vie"), ("aged", "age"), ("used", "use"),
    ("vied", "vie"), ("cued", "cue"), ("died", "die"), ("eyed", "eye"),
    ("hued", "hue"), ("iced", "ice"), ("lied", "lie"), ("owed", "owe"),
    ("sued", "sue"), ("toed", "toe"), ("tied", "tie"), ("does", "do"),
    ("doing", "do"), ("aeronautical", "aeronautics"),
    ("mathematical", "mathematics"), ("political", "politics"),
    ("metaphysical", "metaphysics"), ("cylindrical", "cylinder"),
    ("nazism", "nazi"), ("ambiguity", "ambiguous"),
    ("barbarity", "barbarous"), ("credulity", "credulous"),
    ("generosity", "generous"), ("spontaneity", "spontaneous"),
    ("unanimity", "unanimous"), ("voracity", "voracious"),
    ("fled", "flee"), ("miscarriage", "miscarry"),
]

# KStemmer.java:162-313 — nationality adjective -> country conflations.
_COUNTRY_NATIONALITY = [
    ("afghan", "afghanistan"), ("african", "africa"),
    ("albanian", "albania"), ("algerian", "algeria"),
    ("american", "america"), ("andorran", "andorra"),
    ("angolan", "angola"), ("arabian", "arabia"),
    ("argentine", "argentina"), ("armenian", "armenia"),
    ("asian", "asia"), ("australian", "australia"),
    ("austrian", "austria"), ("azerbaijani", "azerbaijan"),
    ("azeri", "azerbaijan"), ("bangladeshi", "bangladesh"),
    ("belgian", "belgium"), ("bermudan", "bermuda"),
    ("bolivian", "bolivia"), ("bosnian", "bosnia"),
    ("botswanan", "botswana"), ("brazilian", "brazil"),
    ("british", "britain"), ("bulgarian", "bulgaria"),
    ("burmese", "burma"), ("californian", "california"),
    ("cambodian", "cambodia"), ("canadian", "canada"),
    ("chadian", "chad"), ("chilean", "chile"), ("chinese", "china"),
    ("colombian", "colombia"), ("croat", "croatia"),
    ("croatian", "croatia"), ("cuban", "cuba"),
    ("cypriot", "cyprus"), ("czechoslovakian", "czechoslovakia"),
    ("danish", "denmark"), ("egyptian", "egypt"),
    ("equadorian", "equador"), ("eritrean", "eritrea"),
    ("estonian", "estonia"), ("ethiopian", "ethiopia"),
    ("european", "europe"), ("fijian", "fiji"),
    ("filipino", "philippines"), ("finnish", "finland"),
    ("french", "france"), ("gambian", "gambia"),
    ("georgian", "georgia"), ("german", "germany"),
    ("ghanian", "ghana"), ("greek", "greece"),
    ("grenadan", "grenada"), ("guamian", "guam"),
    ("guatemalan", "guatemala"), ("guinean", "guinea"),
    ("guyanan", "guyana"), ("haitian", "haiti"),
    ("hawaiian", "hawaii"), ("holland", "dutch"),
    ("honduran", "honduras"), ("hungarian", "hungary"),
    ("icelandic", "iceland"), ("indonesian", "indonesia"),
    ("iranian", "iran"), ("iraqi", "iraq"), ("iraqui", "iraq"),
    ("irish", "ireland"), ("israeli", "israel"),
    ("italian", "italy"), ("jamaican", "jamaica"),
    ("japanese", "japan"), ("jordanian", "jordan"),
    ("kampuchean", "cambodia"), ("kenyan", "kenya"),
    ("korean", "korea"), ("kuwaiti", "kuwait"),
    ("lankan", "lanka"), ("laotian", "laos"),
    ("latvian", "latvia"), ("lebanese", "lebanon"),
    ("liberian", "liberia"), ("libyan", "libya"),
    ("lithuanian", "lithuania"), ("macedonian", "macedonia"),
    ("madagascan", "madagascar"), ("malaysian", "malaysia"),
    ("maltese", "malta"), ("mauritanian", "mauritania"),
    ("mexican", "mexico"), ("micronesian", "micronesia"),
    ("moldovan", "moldova"), ("monacan", "monaco"),
    ("mongolian", "mongolia"), ("montenegran", "montenegro"),
    ("moroccan", "morocco"), ("myanmar", "burma"),
    ("namibian", "namibia"), ("nepalese", "nepal"),
    ("nicaraguan", "nicaragua"), ("nigerian", "nigeria"),
    ("norwegian", "norway"), ("omani", "oman"),
    ("pakistani", "pakistan"), ("panamanian", "panama"),
    ("papuan", "papua"), ("paraguayan", "paraguay"),
    ("peruvian", "peru"), ("portuguese", "portugal"),
    ("romanian", "romania"), ("rumania", "romania"),
    ("rumanian", "romania"), ("russian", "russia"),
    ("rwandan", "rwanda"), ("samoan", "samoa"),
    ("scottish", "scotland"), ("serb", "serbia"),
    ("serbian", "serbia"), ("siam", "thailand"),
    ("siamese", "thailand"), ("slovakia", "slovak"),
    ("slovakian", "slovak"), ("slovenian", "slovenia"),
    ("somali", "somalia"), ("somalian", "somalia"),
    ("spanish", "spain"), ("swedish", "sweden"),
    ("swiss", "switzerland"), ("syrian", "syria"),
    ("taiwanese", "taiwan"), ("tanzanian", "tanzania"),
    ("texan", "texas"), ("thai", "thailand"),
    ("tunisian", "tunisia"), ("turkish", "turkey"),
    ("ugandan", "uganda"), ("ukrainian", "ukraine"),
    ("uruguayan", "uruguay"), ("uzbek", "uzbekistan"),
    ("venezuelan", "venezuela"), ("vietnamese", "viet"),
    ("virginian", "virginia"), ("yemeni", "yemen"),
    ("yugoslav", "yugoslavia"), ("yugoslavian", "yugoslavia"),
    ("zambian", "zambia"), ("zealander", "zealand"),
    ("zimbabwean", "zimbabwe"),
]

# KStemmer.java:315-332 — head words missing from the main list.
_SUPPLEMENT_DICT = [
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct", "backscatter",
    "connectionism",
]

# KStemmer.java:334-588 — proper nouns that must not be singularized.
_PROPER_NOUNS = [
    "abrams", "achilles", "acropolis", "adams", "agnes", "aires",
    "alexander", "alexis", "alfred", "algiers", "alps", "amadeus",
    "ames", "amos", "andes", "angeles", "annapolis", "antilles",
    "aquarius", "archimedes", "arkansas", "asher", "ashly", "athens",
    "atkins", "atlantis", "avis", "bahamas", "bangor", "barbados",
    "barger", "bering", "brahms", "brandeis", "brussels", "bruxelles",
    "cairns", "camoros", "camus", "carlos", "celts", "chalker",
    "charles", "cheops", "ching", "christmas", "cocos", "collins",
    "columbus", "confucius", "conners", "connolly", "copernicus",
    "cramer", "cyclops", "cygnus", "cyprus", "dallas", "damascus",
    "daniels", "davies", "davis", "decker", "denning", "dennis",
    "descartes", "dickens", "doris", "douglas", "downs", "dreyfus",
    "dukakis", "dulles", "dumfries", "ecclesiastes", "edwards",
    "emily", "erasmus", "euphrates", "evans", "everglades",
    "fairbanks", "federales", "fisher", "fitzsimmons", "fleming",
    "forbes", "fowler", "france", "francis", "goering", "goodling",
    "goths", "grenadines", "guiness", "hades", "harding", "harris",
    "hastings", "hawkes", "hawking", "hayes", "heights", "hercules",
    "himalayas", "hippocrates", "hobbs", "holmes", "honduras",
    "hopkins", "hughes", "humphreys", "illinois", "indianapolis",
    "inverness", "iris", "iroquois", "irving", "isaacs", "italy",
    "james", "jarvis", "jeffreys", "jesus", "jones", "josephus",
    "judas", "julius", "kansas", "keynes", "kipling", "kiwanis",
    "lansing", "laos", "leeds", "levis", "leviticus", "lewis",
    "louis", "maccabees", "madras", "maimonides", "maldive",
    "massachusetts", "matthews", "mauritius", "memphis", "mercedes",
    "midas", "mingus", "minneapolis", "mohammed", "moines", "morris",
    "moses", "myers", "myknos", "nablus", "nanjing", "nantes",
    "naples", "neal", "netherlands", "nevis", "nostradamus",
    "oedipus", "olympus", "orleans", "orly", "papas", "paris",
    "parker", "pauling", "peking", "pershing", "peter", "peters",
    "philippines", "phineas", "pisces", "pryor", "pythagoras",
    "queens", "rabelais", "ramses", "reynolds", "rhesus", "rhodes",
    "richards", "robins", "rodgers", "rogers", "rubens",
    "sagittarius", "seychelles", "socrates", "texas", "thames",
    "thomas", "tiberias", "tunis", "venus", "vilnius", "wales",
    "warner", "wilkins", "williams", "wyoming", "xmas", "yonkers",
    "zeus", "frances", "aarhus", "adonis", "andrews", "angus",
    "antares", "aquinas", "arcturus", "ares", "artemis", "augustus",
    "ayers", "barnabas", "barnes", "becker", "bejing", "biggs",
    "billings", "boeing", "boris", "borroughs", "briggs", "buenos",
    "calais", "caracas", "cassius", "cerberus", "ceres", "cervantes",
    "chantilly", "chartres", "chester", "connally", "conner",
    "coors", "cummings", "curtis", "daedalus", "dionysus", "dobbs",
    "dolores", "edmonds",
]

# Dictionary entries are (root, is_exception): root None means the word
# is its own stem (the defaultEntry in KStemmer.initializeDictHash).
_dict_ht: dict | None = None


def _load_dict() -> dict:
    global _dict_ht
    if _dict_ht is not None:
        return _dict_ht
    d: dict[str, tuple] = {}
    for w in _EXCEPTION_WORDS:
        d[w] = (w, True)
    for w, root in _DIRECT_CONFLATIONS:
        d[w] = (root, False)
    for w, root in _COUNTRY_NATIONALITY:
        d[w] = (root, False)
    default = (None, False)
    path = os.path.join(os.path.dirname(__file__), "data", "kstem_words.txt.gz")
    with gzip.open(path, "rt") as f:
        for w in f.read().split("\n"):
            d.setdefault(w, default)
    for w in _SUPPLEMENT_DICT:
        d.setdefault(w, default)
    for w in _PROPER_NOUNS:
        d.setdefault(w, default)
    _dict_ht = d
    return d


_VOWELS = frozenset("aeiou")


class _KStem:
    """One stemming pass.  ``arr``/``length`` model the reference's
    OpenStringBuilder exactly: setLength only moves the length fence, so
    a later grow re-exposes stale suffix characters (the erAndOrEndings
    '-eer' path depends on this)."""

    __slots__ = ("arr", "length", "j", "k", "matched")

    def __init__(self, term: str):
        self.arr = list(term)
        self.length = len(term)
        self.j = 0
        self.k = len(term) - 1
        self.matched: tuple | None = None

    # --- OpenStringBuilder surface -------------------------------------
    def _set_len(self, n: int) -> None:
        if n > len(self.arr):
            self.arr.extend("\0" * (n - len(self.arr)))
        self.length = n

    def _write(self, ch: str) -> None:
        if self.length == len(self.arr):
            self.arr.append(ch)
        else:
            self.arr[self.length] = ch
        self.length += 1

    def _append(self, s: str) -> None:
        for ch in s:
            self._write(ch)

    def _str(self) -> str:
        return "".join(self.arr[: self.length])

    # --- predicates -----------------------------------------------------
    def _is_cons(self, i: int) -> bool:
        ch = self.arr[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _is_vowel(self, i: int) -> bool:
        return not self._is_cons(i)

    def _double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.arr[i] != self.arr[i - 1]:
            return False
        return self._is_cons(i)

    def _vowel_in_stem(self) -> bool:
        for i in range(self.j + 1):
            if self._is_vowel(i):
                return True
        return False

    # --- suffix tests ---------------------------------------------------
    def _ends_in(self, s: str) -> bool:
        """char-by-char endsIn overloads: j is set only on a match."""
        n = len(s)
        if n > self.k:
            return False
        r = self.length - n
        for i in range(n):
            if self.arr[r + i] != s[i]:
                return False
        self.j = r - 1
        return True

    def _ends_in_arr(self, s: str) -> bool:
        """endsIn(char[]): j is set to k on entry and left there on a
        mismatch (KStemmer.java:781-791)."""
        n = len(s)
        if n > self.k:
            return False
        r = self.length - n
        self.j = self.k
        for i in range(n):
            if self.arr[r + i] != s[i]:
                return False
        self.j = r - 1
        return True

    # --- dictionary -----------------------------------------------------
    def _lookup(self) -> bool:
        self.matched = _dict_ht.get(self._str())
        return self.matched is not None

    def _word_in_dict(self) -> tuple | None:
        if self.matched is not None:
            return self.matched
        e = _dict_ht.get(self._str())
        if e is not None and not e[1]:
            self.matched = e
        return e

    def _set_suffix(self, s: str) -> None:
        self._set_len(self.j + 1)
        self._append(s)
        self.k = self.j + len(s)

    # --- ending routines (cascade order = KStemmer.java:1804-1843) ------
    def _plural(self) -> None:
        if self.arr[self.k] != "s":
            return
        if self._ends_in("ies"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():  # ensure calories -> calorie
                return
            self.k += 1
            self._write("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends_in("es"):
            # try just removing the "s"
            self._set_len(self.j + 2)
            self.k -= 1
            # don't check exceptions: aides -> aide, but the double-s
            # guard keeps crosses from becoming crosse
            try_e = self.j > 0 and not (
                self.arr[self.j] == "s" and self.arr[self.j - 1] == "s"
            )
            if try_e and self._lookup():
                return
            # try removing the "es"
            self._set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            # default: retain the "e"
            self._write("e")
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if (
                self.length > 3
                and self.arr[self.k - 1] != "s"
                and not self._ends_in("ous")
            ):
                # unless the word ends in "ous" or double "s", drop the "s"
                self._set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self) -> None:
        # short words are handled by direct conflation (prevents fled -> fl)
        if self.length <= 4:
            return
        if self._ends_in("ied"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():  # -ied -> -ie for short words (died -> die)
                return
            self.k += 1
            self._write("d")
            self._set_suffix("y")
            self._lookup()
            return
        # vowelInStem keeps acronyms unstemmed
        if self._ends_in("ed") and self._vowel_in_stem():
            # does the root end in 'e'?
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            # try removing the "ed"
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            # try removing a doubled consonant (backfilled -> backfill)
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self._write(self.arr[self.k])
                self.k += 1
                self._lookup()
                return
            # leave "un-" words alone
            if self.arr[0] == "u" and self.arr[1] == "n":
                self._write("e")
                self._write("d")
                self.k += 2
                return
            # default: end with 'e' (microcoded -> microcode)
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            return

    def _aspect(self) -> None:
        # short -ing words are direct conflations (prevents thing -> the)
        if self.length <= 5:
            return
        if self._ends_in("ing") and self._vowel_in_stem():
            # try adding an 'e' to the stem
            self.arr[self.j + 1] = "e"
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            # remove the 'e'
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._set_len(self.k + 1)
                if self._lookup():
                    return
                self._write(self.arr[self.k])  # restore doubled consonant
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) and self._is_cons(self.j - 1):
                # two-consonant stems take no 'e' (footstamping -> footstamp)
                self.k = self.j
                self._set_len(self.k + 1)
                return
            # default: add 'e' (microcoding -> microcode)
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            return

    def _ity_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ity"):
            self._set_len(self.j + 1)  # try removing -ity
            self.k = self.j
            if self._lookup():
                return
            self._write("e")  # try -ity -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self.arr[self.j + 1] = "i"
            self._append("ty")
            self.k = old_k
            # -ability/-ibility are productive: map to -ble
            if self.j > 0 and self.arr[self.j - 1] == "i" and self.arr[self.j] == "l":
                self._set_len(self.j - 1)
                self._append("le")
                self.k = self.j
                self._lookup()
                return
            # -ivity -> -ive
            if self.j > 0 and self.arr[self.j - 1] == "i" and self.arr[self.j] == "v":
                self._set_len(self.j + 1)
                self._write("e")
                self.k = self.j + 1
                self._lookup()
                return
            # -ality -> -al
            if self.j > 0 and self.arr[self.j - 1] == "a" and self.arr[self.j] == "l":
                self._set_len(self.j + 1)
                self.k = self.j
                self._lookup()
                return
            # if the variant is in the dictionary, keep it (immunity->immune
            # logic ran above); otherwise default to removing -ity
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            return

    def _ness_endings(self) -> None:
        if self._ends_in("ness"):
            # very productive: just accept it
            self._set_len(self.j + 1)
            self.k = self.j
            if self.arr[self.j] == "i":
                self.arr[self.j] = "y"
            self._lookup()

    def _ion_endings(self) -> None:
        old_k = self.k
        if not self._ends_in("ion"):
            return
        if self._ends_in_arr("ization"):
            # -ize is productive: accept it as the root
            self._set_len(self.j + 3)
            self._write("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in_arr("ition"):
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():  # definition -> define
                return
            self._set_len(self.j + 1)
            self._append("ition")
            self.k = old_k
        elif self._ends_in_arr("ation"):
            self._set_len(self.j + 3)
            self._write("e")
            self.k = self.j + 3
            if self._lookup():  # elimination -> eliminate
                return
            self._set_len(self.j + 1)
            self._write("e")  # -ation -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)  # just remove -ation (resignation->resign)
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ation")
            self.k = old_k
        # -ication is tested after -ation (complication -> complicate,
        # not comply)
        if self._ends_in_arr("ication"):
            self._set_len(self.j + 1)
            self._write("y")
            self.k = self.j + 1
            if self._lookup():  # amplification -> amplify
                return
            self._set_len(self.j + 1)
            self._append("ication")
            self.k = old_k
        # plain -ion (we checked for it on entry; just reset j)
        self.j = self.k - 3
        self._set_len(self.j + 1)
        self._write("e")
        self.k = self.j + 1
        if self._lookup():  # -ion -> -e
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():  # remove -ion entirely
            return
        self._set_len(self.j + 1)
        self._append("ion")
        self.k = old_k

    def _er_and_or_endings(self) -> None:
        old_k = self.k
        if self.arr[self.k] != "r":
            return
        if self._ends_in("izer"):
            # -ize is productive: accept it
            self._set_len(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_in("er") or self._ends_in("or"):
            word_char = self.arr[self.j + 1]
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.arr[self.j - 1])  # restore doubled consonant
            if self.arr[self.j] == "i":
                # -ier ending
                self.arr[self.j] = "y"
                self._set_len(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                self.arr[self.j] = "i"
                self._write("e")
            if self.arr[self.j] == "e":
                # -eer ending
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write("e")
            self._set_len(self.j + 2)  # remove the -r
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)  # remove -er/-or
            self.k = self.j
            if self._lookup():
                return
            self._write("e")  # -or -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._write(word_char)
            self._write("r")  # restore
            self.k = old_k

    def _ly_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ly"):
            self.arr[self.j + 2] = "e"  # try -ly -> -le
            if self._lookup():
                return
            self.arr[self.j + 2] = "y"
            self._set_len(self.j + 1)  # try removing -ly
            self.k = self.j
            if self._lookup():
                return
            if self.j > 0 and self.arr[self.j - 1] == "a" and self.arr[self.j] == "l":
                return  # always convert -ally to -al
            self._append("ly")
            self.k = old_k
            if self.j > 0 and self.arr[self.j - 1] == "a" and self.arr[self.j] == "b":
                self.arr[self.j + 2] = "e"  # always convert -ably to -able
                self.k = self.j + 2
                return
            if self.arr[self.j] == "i":
                # militarily -> military
                self._set_len(self.j)
                self._write("y")
                self.k = self.j
                if self._lookup():
                    return
                self._set_len(self.j)
                self._append("ily")
                self.k = old_k
            self._set_len(self.j + 1)  # default: remove -ly
            self.k = self.j

    def _al_endings(self) -> None:
        old_k = self.k
        if self.length < 4:
            return
        if self._ends_in("al"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():  # try removing -al
                return
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.arr[self.j - 1])
            self._set_len(self.j + 1)
            self._write("e")  # -al -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("um")  # -al -> -um (optimal -> optimum)
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("al")  # restore
            self.k = old_k
            if self.j > 0 and self.arr[self.j - 1] == "i" and self.arr[self.j] == "c":
                self._set_len(self.j - 1)  # try removing -ical
                self.k = self.j - 2
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                self._write("y")  # -ical -> -y (bibliographical)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                self._append("ic")  # default: -ical -> -ic
                self.k = self.j
                self._lookup()  # (reference keeps this redundant lookup)
                return
            if self.arr[self.j] == "i":
                # some -ial endings drop entirely
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append("ial")
                self.k = old_k
                self._lookup()

    def _ive_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ive"):
            self._set_len(self.j + 1)  # try removing -ive
            self.k = self.j
            if self._lookup():
                return
            self._write("e")  # -ive -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ive")
            if self.j > 0 and self.arr[self.j - 1] == "a" and self.arr[self.j] == "t":
                self.arr[self.j - 1] = "e"  # -ative -> -e (determinative)
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)  # just remove -ative
                if self._lookup():
                    return
                self._append("ative")
                self.k = old_k
            # try -ive -> -ion (injunctive -> injunction)
            self.arr[self.j + 2] = "o"
            self.arr[self.j + 3] = "n"
            if self._lookup():
                return
            self.arr[self.j + 2] = "v"  # restore
            self.arr[self.j + 3] = "e"
            self.k = old_k

    def _ize_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ize"):
            self._set_len(self.j + 1)  # try removing -ize
            self.k = self.j
            if self._lookup():
                return
            self._write("i")
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.arr[self.j - 1])
            self._set_len(self.j + 1)
            self._write("e")  # -ize -> -e
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ize")
            self.k = old_k

    def _ment_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ment"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._append("ment")
            self.k = old_k

    def _ble_endings(self) -> None:
        old_k = self.k
        if self._ends_in("ble"):
            if self.arr[self.j] not in ("a", "i"):
                return
            word_char = self.arr[self.j]
            self._set_len(self.j)  # try just removing the ending
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                self._write(self.arr[self.k - 1])
            self._set_len(self.j)
            self._write("e")  # -a/ible -> -e
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self._append("ate")  # -able -> -ate (compensable/compensate)
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j)
            self._write(word_char)
            self._append("ble")  # restore
            self.k = old_k

    def _ism_endings(self) -> None:
        if self._ends_in("ism"):
            # productive: just accept it
            self._set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ic_endings(self) -> None:
        if self._ends_in("ic"):
            self._set_len(self.j + 3)
            self._append("al")  # -ic -> -ical (canonic -> canonical)
            self.k = self.j + 4
            if self._lookup():
                return
            self.arr[self.j + 1] = "y"  # -ic -> -y
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self.arr[self.j + 1] = "e"  # -ic -> -e
            if self._lookup():
                return
            self._set_len(self.j + 1)  # remove -ic
            self.k = self.j
            if self._lookup():
                return
            self._append("ic")  # restore
            self.k = self.j + 2

    def _ncy_endings(self) -> None:
        if self._ends_in("ncy"):
            if self.arr[self.j] not in ("e", "a"):
                return
            self.arr[self.j + 2] = "t"  # -ncy -> -nt
            self._set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            self.arr[self.j + 2] = "c"  # default: -ncy -> -nce
            self._write("e")
            self.k = self.j + 3
            self._lookup()

    def _nce_endings(self) -> None:
        old_k = self.k
        if self._ends_in("nce"):
            word_char = self.arr[self.j]
            if word_char not in ("e", "a"):
                return
            self._set_len(self.j)
            self._write("e")  # -e/ance -> -e (adherance/adhere)
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)  # remove -e/ance (disappearance/disappear)
            self.k = self.j - 1
            if self._lookup():
                return
            self._write(word_char)
            self._append("nce")  # restore
            self.k = old_k

    def run(self) -> None:
        """The single-pass cascade (KStemmer.java:1804-1843): each routine
        runs until one leaves a dictionary match behind."""
        self._plural()
        if self.matched is not None:
            return
        self._past_tense()
        if self.matched is not None:
            return
        self._aspect()
        if self.matched is not None:
            return
        self._ity_endings()
        if self.matched is not None:
            return
        self._ness_endings()
        if self.matched is not None:
            return
        self._ion_endings()
        if self.matched is not None:
            return
        self._er_and_or_endings()
        if self.matched is not None:
            return
        self._ly_endings()
        if self.matched is not None:
            return
        self._al_endings()
        if self.matched is not None:
            return
        # mid-cascade dictionary probe: if the current form is a known
        # head word, the loop exits after the next routine finds nothing
        # (KStemmer.java:1825)
        self._word_in_dict()
        self._ive_endings()
        if self.matched is not None:
            return
        self._ize_endings()
        if self.matched is not None:
            return
        self._ment_endings()
        if self.matched is not None:
            return
        self._ble_endings()
        if self.matched is not None:
            return
        self._ism_endings()
        if self.matched is not None:
            return
        self._ic_endings()
        if self.matched is not None:
            return
        self._ncy_endings()
        if self.matched is not None:
            return
        self._nce_endings()


def kstem_stem(term: str) -> str:
    """Stem one (already-lowercased) term.  Mirrors KStemmer.stem():
    2-letter and 50+-letter words, non-alphabetic tokens, and dictionary
    head words pass through unchanged; direct conflations return their
    mapped root; everything else runs the ending cascade."""
    d = _load_dict()
    k = len(term) - 1
    if k <= 1 or k >= MAX_WORD_LEN - 1:
        return term
    entry = d.get(term)
    if entry is not None:
        return entry[0] if entry[0] is not None else term
    for ch in term:
        if not ("a" <= ch <= "z"):
            return term
    st = _KStem(term)
    st.run()
    # direct mapping of whatever matched (Italians -> Italian -> Italy)
    if st.matched is not None and st.matched[0] is not None:
        return st.matched[0]
    return st._str()
