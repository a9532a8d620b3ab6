"""Greek analysis (analysis/common el/).

* ``GREEK_FOLD`` / ``greek_fold`` ≙ el/GreekLowerCaseFilter.java:54-113 —
  the diacritic/sigma standardization as a char-for-char translate pair
  (tonos/dialytika vowels → bare lowercase vowel, final sigma → sigma;
  plain case-lowering itself stays with the tokenizer's lower()).  The
  reference folds AFTER tokenization and BEFORE StopFilter; lowering the
  fold to a pre-tokenize translate is equivalent because it is 1:1 on
  letters, and it keeps the el/stopwords.txt stop matching exact (the
  shipped stop list is in post-fold form: "τησ", "εισ", ...).
* ``greek_stem`` ≙ el/GreekStemmer.java:37-890 — Ntais' algorithm: 20
  "short" rules, the rule-21 long suffix list when none fired, and the
  rule-22 comparative strip.  The Java's operator-precedence quirks in
  rule0/rule8 (the length guard binds only to the FIRST endsWith of a
  ``&&``/``||`` chain) are scoring contract and are preserved verbatim.
  Validated against every TestGreekStemmer.java vector (tests/test_intl
  /test_greek.py parse the reference's own test file).

Like the other dictionary-stage stemmers, ``greek_stem`` runs on the
distinct term dictionary (builder.apply_dict_stemmer), one Arrow batch
over the vocabulary.
"""

from __future__ import annotations

GREEK_FOLD = (
    "ςάέήίΐϊόύΰϋώΆΈΉΊΪΌΎΫΏ",
    "σαεηιιιουυυωαεηιιουυω",
)

# post-fold token alphabet (base lowercase Greek letters)
GREEK_LETTERS = "α-ω"

_FOLD_TRANS = str.maketrans(GREEK_FOLD[0], GREEK_FOLD[1])


def greek_fold(w: str) -> str:
    return w.lower().translate(_FOLD_TRANS)


_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")

_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EXC7 = frozenset([
    "αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ", "πεθ", "πικρ",
    "ποτ", "σιχ", "χ"])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EXC9 = frozenset([
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
    "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ", "σκελ",
    "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset([
    "αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ"])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset([
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ", "λεχ",
    "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα"])
_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"])
_EXC17 = frozenset([
    "ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
    "κοινοχρ", "παλιμψ"])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"])


def greek_stem(word: str) -> str:
    if len(word) < 4:
        return word
    s = list(word)
    n = len(s)
    orig = n

    def ew(m: int, suf: str) -> bool:
        return m >= len(suf) and "".join(s[m - len(suf):m]) == suf

    def pre(m: int) -> str:
        return "".join(s[:m])

    def vowel(m: int) -> bool:
        return m > 0 and s[m - 1] in _VOWELS

    def vowel_no_y(m: int) -> bool:
        return m > 0 and s[m - 1] in _VOWELS_NO_Y

    # rule 0 (the len>6 guard binds only to the FIRST endsWith, as in the
    # Java — GreekStemmer.java rule0's parenthesization)
    if n > 9 and (ew(n, "καθεστωτοσ") or ew(n, "καθεστωτων")):
        return pre(n - 4)
    if n > 8 and (ew(n, "γεγονοτοσ") or ew(n, "γεγονοτων")):
        return pre(n - 4)
    if n > 8 and ew(n, "καθεστωτα"):
        return pre(n - 3)
    if n > 7 and (ew(n, "τατογιου") or ew(n, "τατογιων")):
        return pre(n - 4)
    if n > 7 and ew(n, "γεγονοτα"):
        return pre(n - 3)
    if n > 7 and ew(n, "καθεστωσ"):
        return pre(n - 2)
    if ((n > 6 and ew(n, "σκαγιου")) or ew(n, "σκαγιων") or ew(n, "ολογιου")
            or ew(n, "ολογιων") or ew(n, "κρεατοσ") or ew(n, "κρεατων")
            or ew(n, "περατοσ") or ew(n, "περατων") or ew(n, "τερατοσ")
            or ew(n, "τερατων")):
        return pre(n - 4)
    if n > 6 and ew(n, "τατογια"):
        return pre(n - 3)
    if n > 6 and ew(n, "γεγονοσ"):
        return pre(n - 2)
    if n > 5 and (ew(n, "φαγιου") or ew(n, "φαγιων") or ew(n, "σογιου")
                  or ew(n, "σογιων")):
        return pre(n - 4)
    if n > 5 and (ew(n, "σκαγια") or ew(n, "ολογια") or ew(n, "κρεατα")
                  or ew(n, "περατα") or ew(n, "τερατα")):
        return pre(n - 3)
    if n > 4 and (ew(n, "φαγια") or ew(n, "σογια") or ew(n, "φωτοσ")
                  or ew(n, "φωτων")):
        return pre(n - 3)
    if n > 4 and (ew(n, "κρεασ") or ew(n, "περασ") or ew(n, "τερασ")):
        return pre(n - 2)
    if n > 3 and ew(n, "φωτα"):
        return pre(n - 2)
    if n > 2 and ew(n, "φωσ"):
        return pre(n - 1)

    # rules 1-20 run sequentially on the shrinking buffer
    # rule 1
    if n > 4 and (ew(n, "αδεσ") or ew(n, "αδων")):
        n -= 4
        if not (ew(n, "οκ") or ew(n, "μαμ") or ew(n, "μαν") or ew(n, "μπαμπ")
                or ew(n, "πατερ") or ew(n, "γιαγι") or ew(n, "νταντ")
                or ew(n, "κυρ") or ew(n, "θει") or ew(n, "πεθερ")):
            n += 2  # add back -αδ
    # rule 2
    if n > 4 and (ew(n, "εδεσ") or ew(n, "εδων")):
        n -= 4
        if (ew(n, "οπ") or ew(n, "ιπ") or ew(n, "εμπ") or ew(n, "υπ")
                or ew(n, "γηπ") or ew(n, "δαπ") or ew(n, "κρασπ")
                or ew(n, "μιλ")):
            n += 2  # add back -εδ
    # rule 3
    if n > 5 and (ew(n, "ουδεσ") or ew(n, "ουδων")):
        n -= 5
        if (ew(n, "αρκ") or ew(n, "καλιακ") or ew(n, "πεταλ") or ew(n, "λιχ")
                or ew(n, "πλεξ") or ew(n, "σκ") or ew(n, "σ") or ew(n, "φλ")
                or ew(n, "φρ") or ew(n, "βελ") or ew(n, "λουλ") or ew(n, "χν")
                or ew(n, "σπ") or ew(n, "τραγ") or ew(n, "φε")):
            n += 3  # add back -ουδ
    # rule 4
    if n > 3 and (ew(n, "εωσ") or ew(n, "εων")):
        n -= 3
        if pre(n) in _EXC4:
            n += 1  # add back -ε
    # rule 5
    if n > 2 and ew(n, "ια"):
        n -= 2
        if vowel(n):
            n += 1  # add back -ι
    elif n > 3 and (ew(n, "ιου") or ew(n, "ιων")):
        n -= 3
        if vowel(n):
            n += 1  # add back -ι
    # rule 6
    removed = False
    if n > 3 and (ew(n, "ικα") or ew(n, "ικο")):
        n -= 3
        removed = True
    elif n > 4 and (ew(n, "ικου") or ew(n, "ικων")):
        n -= 4
        removed = True
    if removed and (vowel(n) or pre(n) in _EXC6):
        n += 2  # add back -ικ
    # rule 7
    if n == 5 and ew(n, "αγαμε"):
        return pre(n - 1)
    if n > 7 and ew(n, "ηθηκαμε"):
        n -= 7
    elif n > 6 and ew(n, "ουσαμε"):
        n -= 6
    elif n > 5 and (ew(n, "αγαμε") or ew(n, "ησαμε") or ew(n, "ηκαμε")):
        n -= 5
    if n > 3 and ew(n, "αμε"):
        n -= 3
        if pre(n) in _EXC7:
            n += 2  # add back -αμ
    # rule 8 (precedence quirks preserved)
    removed = False
    if n > 8 and ew(n, "ιουντανε"):
        n -= 8
        removed = True
    elif (n > 7 and ew(n, "ιοντανε")) or ew(n, "ουντανε") or ew(n, "ηθηκανε"):
        n -= 7
        removed = True
    elif (n > 6 and ew(n, "ιοτανε")) or ew(n, "οντανε") or ew(n, "ουσανε"):
        n -= 6
        removed = True
    elif (n > 5 and ew(n, "αγανε")) or ew(n, "ησανε") or ew(n, "οτανε") \
            or ew(n, "ηκανε"):
        n -= 5
        removed = True
    if removed and pre(n) in _EXC8A:
        # add -αγαν (we removed > 4 chars so it's safe)
        n += 4
        s[n - 4:n] = list("αγαν")
    if n > 3 and ew(n, "ανε"):
        n -= 3
        if vowel_no_y(n) or pre(n) in _EXC8B:
            n += 2  # add back -αν
    # rule 9
    if n > 5 and ew(n, "ησετε"):
        n -= 5
    if n > 3 and ew(n, "ετε"):
        n -= 3
        if (pre(n) in _EXC9 or vowel_no_y(n) or ew(n, "οδ") or ew(n, "αιρ")
                or ew(n, "φορ") or ew(n, "ταθ") or ew(n, "διαθ")
                or ew(n, "σχ") or ew(n, "ενδ") or ew(n, "ευρ") or ew(n, "τιθ")
                or ew(n, "υπερθ") or ew(n, "ραθ") or ew(n, "ενθ")
                or ew(n, "ροθ") or ew(n, "σθ") or ew(n, "πυρ") or ew(n, "αιν")
                or ew(n, "συνδ") or ew(n, "συν") or ew(n, "συνθ")
                or ew(n, "χωρ") or ew(n, "πον") or ew(n, "βρ") or ew(n, "καθ")
                or ew(n, "ευθ") or ew(n, "εκθ") or ew(n, "νετ") or ew(n, "ρον")
                or ew(n, "αρκ") or ew(n, "βαρ") or ew(n, "βολ")
                or ew(n, "ωφελ")):
            n += 2  # add back -ετ
    # rule 10
    if n > 5 and (ew(n, "οντασ") or ew(n, "ωντασ")):
        n -= 5
        if n == 3 and ew(n, "αρχ"):
            n += 3  # add back *ντ
            s[n - 3] = "ο"
        if ew(n, "κρε"):
            n += 3  # add back *ντ
            s[n - 3] = "ω"
    # rule 11
    if n > 6 and ew(n, "ομαστε"):
        n -= 6
        if n == 2 and ew(n, "ον"):
            n += 5  # add back -ομαστ
    elif n > 7 and ew(n, "ιομαστε"):
        n -= 7
        if n == 2 and ew(n, "ον"):
            n += 5
            s[n - 5:n] = list("ομαστ")
    # rule 12
    if n > 5 and ew(n, "ιεστε"):
        n -= 5
        if pre(n) in _EXC12A:
            n += 4  # add back -ιεστ
    if n > 4 and ew(n, "εστε"):
        n -= 4
        if pre(n) in _EXC12B:
            n += 3  # add back -εστ
    # rule 13
    if n > 6 and ew(n, "ηθηκεσ"):
        n -= 6
    elif n > 5 and (ew(n, "ηθηκα") or ew(n, "ηθηκε")):
        n -= 5
    removed = False
    if n > 4 and ew(n, "ηκεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ηκα") or ew(n, "ηκε")):
        n -= 3
        removed = True
    if removed and (pre(n) in _EXC13 or ew(n, "σκωλ") or ew(n, "σκουλ")
                    or ew(n, "ναρθ") or ew(n, "σφ") or ew(n, "οθ")
                    or ew(n, "πιθ")):
        n += 2  # add back the -ηκ
    # rule 14
    removed = False
    if n > 5 and ew(n, "ουσεσ"):
        n -= 5
        removed = True
    elif n > 4 and (ew(n, "ουσα") or ew(n, "ουσε")):
        n -= 4
        removed = True
    if removed and (pre(n) in _EXC14 or vowel(n) or ew(n, "ποδαρ")
                    or ew(n, "βλεπ") or ew(n, "πανταχ") or ew(n, "φρυδ")
                    or ew(n, "μαντιλ") or ew(n, "μαλλ") or ew(n, "κυματ")
                    or ew(n, "λαχ") or ew(n, "ληγ") or ew(n, "φαγ")
                    or ew(n, "ομ") or ew(n, "πρωτ")):
        n += 3  # add back -ουσ
    # rule 15
    removed = False
    if n > 4 and ew(n, "αγεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "αγα") or ew(n, "αγε")):
        n -= 3
        removed = True
    if removed:
        cond1 = (pre(n) in _EXC15A or ew(n, "οφ") or ew(n, "πελ")
                 or ew(n, "χορτ") or ew(n, "λλ") or ew(n, "σφ")
                 or ew(n, "ρπ") or ew(n, "φρ") or ew(n, "πρ")
                 or ew(n, "λοχ") or ew(n, "σμην"))
        cond2 = pre(n) in _EXC15B or ew(n, "κολλ")
        if cond1 and not cond2:
            n += 2  # add back -αγ
    # rule 16
    removed = False
    if n > 4 and ew(n, "ησου"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ησε") or ew(n, "ησα")):
        n -= 3
        removed = True
    if removed and pre(n) in _EXC16:
        n += 2  # add back -ησ
    # rule 17
    if n > 4 and ew(n, "ηστε"):
        n -= 4
        if pre(n) in _EXC17:
            n += 3  # add back the -ηστ
    # rule 18
    removed = False
    if n > 6 and (ew(n, "ησουνε") or ew(n, "ηθουνε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουνε"):
        n -= 4
        removed = True
    if removed and pre(n) in _EXC18:
        n += 3
        s[n - 3:n] = list("ουν")
    # rule 19
    removed = False
    if n > 6 and (ew(n, "ησουμε") or ew(n, "ηθουμε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουμε"):
        n -= 4
        removed = True
    if removed and pre(n) in _EXC19:
        n += 3
        s[n - 3:n] = list("ουμ")
    # rule 20
    if n > 5 and (ew(n, "ματων") or ew(n, "ματοσ")):
        n -= 3
    elif n > 4 and ew(n, "ματα"):
        n -= 2

    # rule 21 (the "long list") only when nothing fired
    if n == orig:
        n = _rule21(s, n, ew, vowel)
    # rule 22
    if ew(n, "εστερ") or ew(n, "εστατ"):
        return pre(n - 5)
    if (ew(n, "οτερ") or ew(n, "οτατ") or ew(n, "υτερ") or ew(n, "υτατ")
            or ew(n, "ωτερ") or ew(n, "ωτατ")):
        return pre(n - 4)
    return pre(n)


def _rule21(s: list, n: int, ew, vowel) -> int:
    if n > 9 and ew(n, "ιοντουσαν"):
        return n - 9
    if n > 8 and (ew(n, "ιομασταν") or ew(n, "ιοσασταν")
                  or ew(n, "ιουμαστε") or ew(n, "οντουσαν")):
        return n - 8
    if n > 7 and (ew(n, "ιεμαστε") or ew(n, "ιεσαστε") or ew(n, "ιομουνα")
                  or ew(n, "ιοσαστε") or ew(n, "ιοσουνα") or ew(n, "ιουνται")
                  or ew(n, "ιουνταν") or ew(n, "ηθηκατε") or ew(n, "ομασταν")
                  or ew(n, "οσασταν") or ew(n, "ουμαστε")):
        return n - 7
    if n > 6 and (ew(n, "ιομουν") or ew(n, "ιονταν") or ew(n, "ιοσουν")
                  or ew(n, "ηθειτε") or ew(n, "ηθηκαν") or ew(n, "ομουνα")
                  or ew(n, "οσαστε") or ew(n, "οσουνα") or ew(n, "ουνται")
                  or ew(n, "ουνταν") or ew(n, "ουσατε")):
        return n - 6
    if n > 5 and (ew(n, "αγατε") or ew(n, "ιεμαι") or ew(n, "ιεται")
                  or ew(n, "ιεσαι") or ew(n, "ιοταν") or ew(n, "ιουμα")
                  or ew(n, "ηθεισ") or ew(n, "ηθουν") or ew(n, "ηκατε")
                  or ew(n, "ησατε") or ew(n, "ησουν") or ew(n, "ομουν")
                  or ew(n, "ονται") or ew(n, "ονταν") or ew(n, "οσουν")
                  or ew(n, "ουμαι") or ew(n, "ουσαν")):
        return n - 5
    if n > 4 and (ew(n, "αγαν") or ew(n, "αμαι") or ew(n, "ασαι")
                  or ew(n, "αται") or ew(n, "ειτε") or ew(n, "εσαι")
                  or ew(n, "εται") or ew(n, "ηδεσ") or ew(n, "ηδων")
                  or ew(n, "ηθει") or ew(n, "ηκαν") or ew(n, "ησαν")
                  or ew(n, "ησει") or ew(n, "ησεσ") or ew(n, "ομαι")
                  or ew(n, "οταν")):
        return n - 4
    if n > 3 and (ew(n, "αει") or ew(n, "εισ") or ew(n, "ηθω")
                  or ew(n, "ησω") or ew(n, "ουν") or ew(n, "ουσ")):
        return n - 3
    if n > 2 and (ew(n, "αν") or ew(n, "ασ") or ew(n, "αω") or ew(n, "ει")
                  or ew(n, "εσ") or ew(n, "ησ") or ew(n, "οι") or ew(n, "οσ")
                  or ew(n, "ου") or ew(n, "υσ") or ew(n, "ων")):
        return n - 2
    if n > 1 and vowel(n):
        return n - 1
    return n


def greek_fold_and_stem(w: str) -> str:
    """The dictionary-stage composition for Analyzer.greek(): the fold is
    also applied pre-tokenize (char_fold), so this is idempotent on
    already-folded terms; composing here keeps standalone use correct."""
    return greek_stem(greek_fold(w))
