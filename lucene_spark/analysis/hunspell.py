"""Hunspell dictionary-based stemming — the analysis/hunspell module's
stemmer surface re-expressed in Python.

Reference: analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Dictionary.java (the .aff/.dic parser), AffixCondition.java (condition
compilation relative to the strip), Stemmer.java (doStem /
removeAffixes / stripAffix / isAffixCompatible / applyAffix /
needsAnotherAffix — the hunspell recursive affix-stripping algorithm).

Declared subset (stemming of simple words, the HunspellStemFilter use):

* PFX/SFX rules with strips, conditions, continuation classes and the
  cross-product rules; two-stage suffixes and prefix+suffix combos with
  the exact recursion-depth control flow of Stemmer.applyAffix
  (COMPLEXPREFIXES included).
* FLAG single-char / long / num / UTF-8; AF flag aliases.
* FULLSTRIP, CIRCUMFIX, NEEDAFFIX/PSEUDOROOT, IGNORE, ONLYINCOMPOUND
  (simple-word rejection), KEEPCASE (parsed; stemming is unaffected),
  ICONV/OCONV conversion tables, st: morphological stem exceptions with
  AM aliases, ignoreCase dictionaries, hidden capitalized entries, the
  analyze-time case variation (UPPER/TITLE folds, apostrophe
  capitalization, CHECKSHARPS ss<->ß enumeration, LANG tr/az Turkish
  dotted-I folds).
* OUT of subset: compounding, BREAK, suggestions, GENERATE/morph output
  beyond st:.

Validated against the reference's OWN test dictionaries
(analysis/common/src/test/.../hunspell/*.aff + *.dic) with assertions
transliterated from StemmerTestBase subclasses (tests/test_hunspell.py).

Index integration: like every dictionary-stage stemmer here, a
HunspellStemmer runs ONCE PER DISTINCT TERM over the vocabulary
(builder.apply_dict_stemmer shape) — O(|V|) Python, never per token.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Affix:
    kind: str  # 'PFX' | 'SFX'
    flag: object
    strip: str
    affix: str
    cont: frozenset  # continuation (append) flags
    cross: bool
    cond: object  # callable(stem:str)->bool


def _compile_condition(kind: str, strip: str, condition: str):
    """AffixCondition.compile (AffixCondition.java:69-115): the condition
    describes the STEM (strip re-added); the strip part is checked at
    parse time and the remainder is matched against the stem's head/tail
    character patterns."""

    def always_true(_):
        return True

    def always_false(_):
        return False

    def is_regexp(c):
        return "[" in c or "." in c or "-" in c

    def skip_char_pattern(c, pos):
        if c[pos] == "[":
            pos = c.index("]", pos + 1)
        return pos + 1

    def count_char_patterns(c):
        n, i = 0, 0
        while i < len(c):
            i = skip_char_pattern(c, i)
            n += 1
        return n

    def skip_char_patterns(c, count):
        pos = 0
        for _ in range(count):
            pos = skip_char_pattern(c, pos)
        return pos

    def _rx(c):
        # dash has no special meaning; escape unescaped ones (escapeDash)
        out = []
        i = 0
        while i < len(c):
            ch = c[i]
            if ch == "\\" and i + 1 < len(c):
                out.append(c[i : i + 2])
                i += 2
                continue
            out.append("\\-" if ch == "-" else ch)
            i += 1
        return "".join(out)

    def full_matches(s, c):
        try:
            return re.fullmatch(_rx(c), s) is not None
        except re.error:
            return False

    if condition == ".":
        return always_true
    if not is_regexp(condition):
        if kind == "SFX" and condition.endswith(strip):
            sub = condition[: len(condition) - len(strip)]
            return (
                lambda stem: len(stem) >= len(sub) and stem.endswith(sub)
            )
        if kind == "PFX" and condition.startswith(strip):
            sub = condition[len(strip) :]
            return (
                lambda stem: len(stem) >= len(sub) and stem.startswith(sub)
            )
        return always_false

    c = condition
    last = c.rfind("[")
    if last >= 0 and c.find("]", last + 1) < 0:
        c = c + "]"  # unclosed [ tolerated
    try:
        n_chars = count_char_patterns(c)
    except ValueError:
        return always_false
    if n_chars <= len(strip):
        rx = (".*" + c) if kind == "PFX" else (c + ".*")
        return always_true if full_matches(strip, rx) else always_false
    if kind == "PFX":
        split = skip_char_patterns(c, len(strip))
        if not full_matches(strip, c[:split]):
            return always_false
        tail, count = c[split:], n_chars - len(strip)

        def pfx_cond(stem, tail=tail, count=count):
            return len(stem) >= count and full_matches(stem[:count], tail)

        return pfx_cond
    split = skip_char_patterns(c, n_chars - len(strip))
    if not full_matches(strip, c[split:]):
        return always_false
    head, count = c[:split], n_chars - len(strip)

    def sfx_cond(stem, head=head, count=count):
        return len(stem) >= count and full_matches(stem[-count:], head)

    return sfx_cond


class _Flags:
    """FlagParsingStrategy family (Dictionary.java:1330+)."""

    def __init__(self, mode: str = "char"):
        self.mode = mode  # char | long | num | utf8 (char==utf8 here)

    def parse_one(self, s: str):
        flags = self.parse(s)
        return flags[0] if flags else None

    def parse(self, s: str):
        if not s:
            return ()
        if self.mode == "num":
            out = []
            for part in s.split(","):
                part = part.strip()
                if part.isdigit():
                    out.append(int(part))
            return tuple(out)
        if self.mode == "long":
            return tuple(s[i : i + 2] for i in range(0, len(s) - 1, 2))
        return tuple(s)  # char / UTF-8: one codepoint per flag


@dataclass
class HunspellDictionary:
    """Parsed .aff + .dic pair."""

    prefixes: dict = field(default_factory=dict)  # affix string -> [Affix]
    suffixes: dict = field(default_factory=dict)
    words: dict = field(default_factory=dict)  # word -> list[frozenset flags]
    ignore: str = ""
    full_strip: bool = False
    complex_prefixes: bool = False
    circumfix: object = None
    needaffix: object = None
    keepcase: object = None
    onlyincompound: object = None
    second_stage_prefix: set = field(default_factory=set)
    second_stage_suffix: set = field(default_factory=set)
    # ignoreCase dictionaries (Dictionary ctor arg, the
    # HunspellStemFilterFactory ignoreCase option): entries are stored
    # case-folded and inputs fold before lookup (cleanInput)
    ignore_case: bool = False
    # ICONV/OCONV replacement tables (ConvTable.java: longest match at
    # each position, non-recursive): input conversion before lookup,
    # output conversion on emitted stems
    iconv: dict = field(default_factory=dict)
    oconv: dict = field(default_factory=dict)
    # CHECKSHARPS: UPPER-case variants also try ss<->ß combinations
    # (Stemmer.varySharpS, enumeration capped at depth 5)
    check_sharp_s: bool = False
    # LANG tr_TR/az: Turkish alternate casing (İ->i, I->ı case folds)
    alternate_casing: bool = False

    def case_fold(self, c: str) -> str:
        # Character.toLowerCase semantics: U+0130 İ folds to a BARE 'i'
        # (python str.lower would add a combining dot)
        if c == "İ":
            return "i"
        if self.alternate_casing and c == "I":
            return "ı"
        return c.lower()

    # -- parsing ---------------------------------------------------------
    @classmethod
    def from_strings(
        cls, aff: str, dic: str, ignore_case: bool = False
    ) -> "HunspellDictionary":
        """Parse from in-memory .aff/.dic content (UTF-8 semantics)."""
        import tempfile

        with tempfile.NamedTemporaryFile(
            "w", suffix=".aff", delete=False, encoding="utf-8"
        ) as fa:
            fa.write(aff)
        with tempfile.NamedTemporaryFile(
            "w", suffix=".dic", delete=False, encoding="utf-8"
        ) as fd:
            fd.write(dic)
        return cls.load(fa.name, fd.name, ignore_case=ignore_case)

    @classmethod
    def load(
        cls, aff_path: str, dic_path: str, ignore_case: bool = False
    ) -> "HunspellDictionary":
        d = cls(ignore_case=ignore_case)
        encoding = "iso8859-1"  # the hunspell default (Dictionary.java)
        # pre-scan for SET (applies to both files)
        with open(aff_path, "rb") as f:
            for raw in f:
                line = raw.decode("latin-1").strip()
                if line.startswith("SET"):
                    enc = line.split()[1].strip().lower().replace("-", "_")
                    encoding = {"utf_8": "utf-8"}.get(enc, enc)
                    break
        flags = _Flags()
        aliases: list = []
        morph_aliases: list = []
        hidden_groups: dict = {}
        with open(aff_path, encoding=encoding, errors="replace") as f:
            lines = iter(f.read().splitlines())
        for line in lines:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            cmd = parts[0]
            if cmd == "FLAG" and len(parts) > 1:
                flags = _Flags(
                    {"long": "long", "num": "num", "UTF-8": "char"}.get(
                        parts[1], "char"
                    )
                )
            elif cmd == "AF" and len(parts) > 1 and parts[1].isdigit() and len(parts) == 2:
                pass  # alias count header
            elif cmd == "AF":
                aliases.append(parts[1] if len(parts) > 1 else "")
            elif cmd == "AM" and len(parts) == 2 and parts[1].isdigit():
                pass  # morph alias count header
            elif cmd == "AM":
                morph_aliases.append(" ".join(parts[1:]))
            elif cmd in ("ICONV", "OCONV"):
                if len(parts) >= 3 and not parts[1].isdigit():
                    tgt = d.iconv if cmd == "ICONV" else d.oconv
                    tgt[parts[1]] = parts[2]
            elif cmd == "CHECKSHARPS":
                d.check_sharp_s = True
            elif cmd == "LANG" and len(parts) > 1:
                d.alternate_casing = parts[1][:2] in ("tr", "az")
            elif cmd == "IGNORE":
                d.ignore = parts[1]
            elif cmd == "FULLSTRIP":
                d.full_strip = True
            elif cmd == "COMPLEXPREFIXES":
                d.complex_prefixes = True
            elif cmd == "CIRCUMFIX":
                d.circumfix = flags.parse_one(parts[1])
            elif cmd in ("NEEDAFFIX", "PSEUDOROOT"):
                d.needaffix = flags.parse_one(parts[1])
            elif cmd == "KEEPCASE":
                d.keepcase = flags.parse_one(parts[1])
            elif cmd == "ONLYINCOMPOUND":
                d.onlyincompound = flags.parse_one(parts[1])
            elif cmd in ("PFX", "SFX") and len(parts) >= 4 and parts[3].isdigit() and parts[2] in ("Y", "N"):
                kind, flag_s, cross = cmd, parts[1], parts[2] == "Y"
                flag = flags.parse_one(flag_s)
                n = int(parts[3])
                for _ in range(n):
                    rline = next(lines, "")
                    rp = rline.split()
                    if len(rp) < 4 or rp[0] != kind:
                        continue
                    strip = "" if rp[2] == "0" else rp[2]
                    affix_arg = rp[3]
                    cont: tuple = ()
                    sep = affix_arg.rfind("/")
                    if sep != -1:
                        flag_part = affix_arg[sep + 1 :]
                        affix_arg = affix_arg[:sep]
                        if aliases and flag_part.isdigit():
                            flag_part = aliases[int(flag_part) - 1]
                        cont = flags.parse(flag_part)
                    if affix_arg == "0":
                        affix_arg = ""
                    condition = rp[4] if len(rp) > 4 else "."
                    cond = _compile_condition(kind, strip, condition)
                    a = Affix(
                        kind, flag, strip, affix_arg, frozenset(cont), cross, cond
                    )
                    tgt = d.prefixes if kind == "PFX" else d.suffixes
                    tgt.setdefault(affix_arg, []).append(a)
                    stage = (
                        d.second_stage_prefix
                        if kind == "PFX"
                        else d.second_stage_suffix
                    )
                    stage.update(cont)
            # all other commands are out of the declared subset
        with open(dic_path, encoding=encoding, errors="replace") as f:
            dic_lines = f.read().splitlines()
        for line in dic_lines[1:]:
            raw_line = line.rstrip()
            if not raw_line or raw_line.startswith("#"):
                continue
            # split off trailing morphological fields ("po:number",
            # "st:...", tab-separated data or an AM alias number) —
            # entries themselves may contain spaces (spaces.dic)
            tab_split = raw_line.split("\t", 1)
            morph = tab_split[1].strip() if len(tab_split) > 1 else ""
            head = tab_split[0].strip()
            m = re.split(r"\s+(?=\S{2,}:\S)", head, maxsplit=1)
            line = m[0].strip()
            if len(m) > 1:
                morph = (m[1].strip() + " " + morph).strip()
            if morph_aliases and morph.split() and morph.split()[0].isdigit():
                morph = morph_aliases[int(morph.split()[0]) - 1]
            st = None
            for fldm in re.finditer(r"(?:^| )st:(\S+)", morph):
                st = fldm.group(1)
                break
            if not line:
                continue
            # unescaped last slash splits word/flags ("\/" is literal)
            word, flag_part = line, ""
            i = len(line) - 1
            while i > 0:
                # a leading '/' can't be a separator (the word is never
                # empty — "\/" escapes a literal-slash entry)
                if line[i] == "/" and line[i - 1] != "\\":
                    word, flag_part = line[:i], line[i + 1 :]
                    break
                i -= 1
            word = word.replace("\\/", "/").strip()
            if not word:
                continue
            flag_part = flag_part.split()[0] if flag_part.split() else ""
            if aliases and flag_part.isdigit():
                flag_part = aliases[int(flag_part) - 1]
            if d.ignore:
                word = "".join(c for c in word if c not in d.ignore)
            if d.ignore_case:
                word = word.lower()
            entry = (frozenset(flags.parse(flag_part)), st)
            d.words.setdefault(word, []).append(entry)
            # hidden capitalized variant (Dictionary.addHiddenCapitalized-
            # Word:1060): MIXED-case entries, and UPPER entries with
            # flags, are also stored title-folded so case-varied lookups
            # find them
            letters = [c for c in word if c.isalpha()]
            if letters:
                has_upper = any(c.isupper() for c in letters)
                has_lower = any(c.islower() for c in letters)
                case = (
                    "UPPER"
                    if has_upper and not has_lower
                    else (
                        "TITLE"
                        if word[:1].isupper()
                        and not any(c.isupper() for c in word[1:])
                        else ("MIXED" if has_upper else "LOWER")
                    )
                )
                if case == "MIXED" or (case == "UPPER" and flag_part):
                    hidden = word[0].upper() + word[1:].lower()
                    hidden_groups.setdefault(hidden, []).append(entry)
        # WordStorage.flushGroup:355-366: hidden entries are dropped when
        # the same surface form also has a real entry
        for w, entries in hidden_groups.items():
            if w not in d.words:
                d.words[w] = list(entries)
        return d


def _apply_conv(s: str, table: dict) -> str:
    """ConvTable.applyMappings: the longest key matching at each position
    replaces, scanning resumes after the replacement (non-recursive)."""
    if not table:
        return s
    keys = sorted(table, key=len, reverse=True)
    out = []
    i = 0
    while i < len(s):
        hit = None
        for k in keys:
            if s.startswith(k, i):
                hit = k
                break
        if hit:
            out.append(table[hit])
            i += len(hit)
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


class HunspellStemmer:
    """Stemmer.java's recursive affix stripping over the parsed tables
    (SIMPLE_WORD context)."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    def stem(self, word: str) -> list[str]:
        """All stems, in the reference's discovery order (Stemmer.stem /
        analyze: the exact word, then — for UPPER/TITLE-cased words — the
        title-folded and lower-folded case variants)."""
        d = self.d
        word = _apply_conv(word, d.iconv)
        if d.ignore:
            word = "".join(c for c in word if c not in d.ignore)
        if d.ignore_case:
            word = word.lower()  # Dictionary.cleanInput
        if not word:
            return []
        out: list[str] = []

        def accept_root(stem, entry_flags):
            out.append(_apply_conv(stem, d.oconv))  # Stemmer.newStem oconv
            return True

        self._do_stem(word, accept_root)
        letters = [c for c in word if c.isalpha()]
        has_upper = any(c.isupper() for c in letters)
        if has_upper and not d.ignore_case:
            # Stemmer.varyCase: UPPER -> apostrophe-capitalized title,
            # title, sharp-s variants, lower, sharp-s of lower;
            # TITLE -> lower only
            all_upper = all(not c.islower() for c in letters)
            fold = d.case_fold
            title = word[0] + "".join(fold(c) for c in word[1:])
            lower = fold(title[0]) + title[1:]
            variants: list = []
            # Dictionary.isDotICaseChangeDisallowed: outside tr/az, a
            # word containing İ must not take the lowercase variant (the
            # İ->i fold is Turkish-specific) — varyCase returns before
            # the lower fold
            dot_i_blocked = "İ" in word and not d.alternate_casing
            if all_upper:
                apos = list(title)
                for i in range(1, len(apos) - 1):
                    if apos[i] == "'":
                        apos[i + 1] = apos[i + 1].upper()
                apos = "".join(apos)
                if apos != title:
                    variants.append(apos)
                variants.append(title)
                if d.check_sharp_s:
                    variants.extend(self._sharp_s_variants(title))
                if not dot_i_blocked:
                    variants.append(lower)
                    if d.check_sharp_s:
                        variants.extend(self._sharp_s_variants(lower))
            elif word[:1].isupper() and all(
                not c.isupper() for c in word[1:]
            ):
                variants = [] if dot_i_blocked else [lower]  # TITLE
            for v in variants:
                if v != word:
                    self._do_stem(v, accept_root)
        return out

    @staticmethod
    def _sharp_s_variants(word: str) -> list:
        """Stemmer.varySharpS: every combination of replacing 'ss' runs
        with 'ß' (depth-capped at 5), excluding the unmodified word."""

        def replace_ss(start, depth):
            if depth > 5:
                return [word[start:]]
            ss = word.find("ss", start)
            if ss < 0:
                return None
            prefix = word[start:ss]
            tails = replace_ss(ss + 2, depth + 1)
            if tails is None:
                tails = [word[ss + 2 :]]
            out = []
            for t in tails:
                out.append(prefix + "ss" + t)
                out.append(prefix + "ß" + t)
            return out

        combos = replace_ss(0, 0)
        if combos is None:
            return []
        return [c for c in combos if c != word]

    def unique_stems(self, word: str) -> list[str]:
        seen, out = set(), []
        for s in self.stem(word):
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    # -- Stemmer.doStem ---------------------------------------------------
    def _do_stem(self, word: str, emit):
        d = self.d
        for entry_flags, st in d.words.get(word, ()):
            if d.needaffix is not None and d.needaffix in entry_flags:
                continue  # pseudostem requiring an affix
            if (
                d.onlyincompound is not None
                and d.onlyincompound in entry_flags
            ):
                continue
            emit(st if st is not None else word, entry_flags)

        def candidate(stem, last_affix, outer_p, inner_p, outer_s, inner_s):
            forms = d.words.get(stem)
            if not forms:
                return
            flag = last_affix.flag
            prefix = inner_p if inner_p is not None else outer_p
            for entry_flags, st in forms:
                if flag in entry_flags or (
                    prefix is not None and flag in prefix.cont
                ):
                    if inner_p is None and outer_p is not None:
                        pf = outer_p.flag
                        if pf not in entry_flags and pf not in last_affix.cont:
                            continue
                    if (
                        d.onlyincompound is not None
                        and d.onlyincompound in entry_flags
                    ):
                        continue
                    emit(st if st is not None else stem, entry_flags)

        self._remove_affixes(word, True, None, None, None, candidate)

    # -- Stemmer.removeAffixes -------------------------------------------
    def _remove_affixes(self, word, do_prefix, outer_p, inner_p, outer_s, candidate):
        d = self.d
        if do_prefix and d.prefixes:
            limit = len(word) + 1 if d.full_strip else len(word)
            for i in range(0, limit):
                for affix in d.prefixes.get(word[:i], ()):
                    if affix is outer_p:
                        continue
                    if not self._compatible(affix, True, outer_p, outer_s):
                        continue
                    stripped = self._strip(word, i, affix, True)
                    if stripped is None:
                        continue
                    self._apply(
                        stripped, affix, True, outer_p, inner_p, outer_s, candidate
                    )
        if d.suffixes:
            limit = 0 if d.full_strip else 1
            for i in range(len(word), limit - 1, -1):
                for affix in d.suffixes.get(word[i:], ()):
                    if affix is outer_s:
                        continue
                    if not self._compatible(affix, False, outer_p, outer_s):
                        continue
                    stripped = self._strip(word, len(word) - i, affix, False)
                    if stripped is None:
                        continue
                    self._apply(
                        stripped, affix, False, outer_p, inner_p, outer_s, candidate
                    )

    # -- Stemmer.stripAffix ----------------------------------------------
    def _strip(self, word, affix_len, affix: Affix, is_prefix: bool):
        de_len = len(word) - affix_len
        if len(affix.strip) + de_len == 0:
            return None
        de_part = word[affix_len:] if is_prefix else word[:de_len]
        stem = (affix.strip + de_part) if is_prefix else (de_part + affix.strip)
        if not affix.cond(stem):
            return None
        return stem

    # -- Stemmer.isAffixCompatible (SIMPLE_WORD) -------------------------
    def _compatible(self, affix: Affix, is_prefix, outer_p, outer_s):
        d = self.d
        if d.onlyincompound is not None and d.onlyincompound in affix.cont:
            return False
        if outer_p is None and outer_s is None:
            return True
        if affix.cross:
            previous_was_prefix = outer_s is None and outer_p is not None
            if previous_was_prefix:
                return True
            if outer_s is not None:
                return outer_s.flag in affix.cont
        return False

    # -- Stemmer.applyAffix ----------------------------------------------
    def _apply(self, word, affix: Affix, is_prefix, outer_p, inner_p, outer_s, candidate):
        d = self.d
        prefix = inner_p if inner_p is not None else outer_p
        previous = outer_s if outer_s is not None else prefix

        inner_s = None
        if is_prefix:
            if outer_p is None:
                outer_p = affix
            else:
                inner_p = affix
        else:
            if outer_s is None:
                outer_s = affix
            else:
                inner_s = affix

        if not self._needs_another(affix, previous, not is_prefix, prefix):
            candidate(word, affix, outer_p, inner_p, outer_s, inner_s)

        if inner_s is not None:
            return

        depth = (
            (1 if outer_s is not None else 0)
            + (2 if inner_p is not None else (1 if outer_p is not None else 0))
            - 1
        )
        if affix.cross and depth <= 1:
            flag = affix.flag
            if depth == 0:
                if is_prefix:
                    do_prefix = d.complex_prefixes and flag in d.second_stage_prefix
                elif not d.complex_prefixes and flag in d.second_stage_suffix:
                    do_prefix = False
                else:
                    return
            else:
                if is_prefix and d.complex_prefixes:
                    do_prefix = True
                elif (
                    is_prefix
                    or d.complex_prefixes
                    or flag not in d.second_stage_suffix
                ):
                    return
                else:
                    do_prefix = False
            self._remove_affixes(word, do_prefix, outer_p, inner_p, outer_s, candidate)

    # -- Stemmer.needsAnotherAffix ---------------------------------------
    def _needs_another(self, affix: Affix, previous, is_suffix, prefix):
        d = self.d
        if d.circumfix is not None and is_suffix:
            in_prefix = prefix is not None and d.circumfix in prefix.cont
            in_this = d.circumfix in affix.cont
            if in_prefix != in_this:
                return True
        if d.needaffix is not None and d.needaffix in affix.cont:
            return (
                not is_suffix
                or previous is None
                or (d.needaffix in previous.cont)
            )
        return False


def stem_fn(dictionary: HunspellDictionary, longest_only: bool = True):
    """term -> stem function for the dictionary-stage stem pass
    (builder.apply_dict_stemmer), matching HunspellStemFilter semantics
    (hunspell/HunspellStemFilter.java:43): words with no stems pass
    through unchanged; ``longest_only`` picks the longest stem (the
    filter's longestOnly option — stable on ties, discovery order),
    the single-output shape the dictionary stage needs."""
    stemmer = HunspellStemmer(dictionary)

    def fn(term: str) -> str:
        stems = stemmer.unique_stems(term)
        if not stems:
            return term
        if longest_only:
            return max(stems, key=len)  # max is stable: first-longest wins
        return stems[0]

    return fn


def all_stems_fn(dictionary: HunspellDictionary):
    """term -> [stems] multi-output function — HunspellStemFilter's
    DEFAULT mode (dedup=true, every stem emitted at the token's
    position; the original passes through when nothing stems).  Marked
    ``emits_multiple`` so the dictionary-stage pass expands each term
    into several index terms (builder.apply_dict_stemmer)."""
    stemmer = HunspellStemmer(dictionary)

    def fn(term: str):
        stems = stemmer.unique_stems(term)
        return stems if stems else [term]

    fn.emits_multiple = True
    return fn


def register_stemmer(
    name: str,
    dictionary: HunspellDictionary,
    longest_only: bool = True,
    all_stems: bool = False,
) -> str:
    """Register a Hunspell dictionary as a named dictionary-stage stemmer
    usable as ``Analyzer(stemmer=name)`` — the HunspellStemFilterFactory
    plug point (``all_stems=True`` = the filter's default emit-every-stem
    mode; default = longestOnly).  Like Solr configs, the registration
    (dictionary files) must be repeated in each session before loading an
    index built with it."""
    from lucene_spark.analysis.analyzer import DICT_STEMMERS

    DICT_STEMMERS[name] = (
        all_stems_fn(dictionary)
        if all_stems
        else stem_fn(dictionary, longest_only)
    )
    return name
