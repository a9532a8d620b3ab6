"""Single-node pure-Python oracle with exact reference semantics.

Implements, in plain Python/numpy, exactly what the reference computes
(SURVEY.md §5 "The oracle") so the Spark engine can be tested for rank- AND
score-identity (float32):

* tokenize: the shared spec in ``lucene_spark.analysis.tokenizer``
* norms: ``intToByte4(num_tokens)`` (``SmallFloat.java:103-156``,
  ``BM25Similarity.computeNorm`` at ``BM25Similarity.java:131-142``)
* stats: GLOBAL docCount / sumTotalTermFreq → avgdl
  (``IndexSearcher.collectionStatistics``, ``IndexSearcher.java:913-928``)
* BM25 float32 algebra with the 256-entry normInverse cache
  (``BM25Similarity.java:104-111, 196-210, 246-258``):
      idf     = float32( ln(1 + (N - n + 0.5)/(n + 0.5)) )       # double→float
      avgdl   = float32( sumTotalTermFreq / docCount )           # double→float
      cache[i]= 1f / (k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl))  # all f32
      score   = weight - weight / (1f + freq * cache[norm])        # all f32
  weight = boost * idf (float32).
* Boolean combination: SHOULD/MUST sums accumulate per-term float32 scores in
  a float64 then cast to float32 (``DisjunctionSumScorer.java:43-48``,
  ``ConjunctionScorer.java:58-64``).
* top-k tie-break: (score desc, doc_id asc) (``HitQueue.java:77-84``,
  ``TopDocs.java:76-117``).

This file is the trusted reference — it is deliberately simple and slow.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass, field

import numpy as np

from lucene_spark.analysis.tokenizer import tokenize_text
from lucene_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4


@dataclass
class OracleDoc:
    doc_id: int
    conv_id: str
    turn_idx: int
    tokens: list[str]
    norm: int  # byte4-encoded length, 0..255


@dataclass
class OracleIndex:
    """In-memory inverted index over transcript turns."""

    docs: list[OracleDoc] = field(default_factory=list)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> doc_id -> freq
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    k1: float = 1.2
    b: float = 0.75

    @classmethod
    def build(cls, rows, k1: float = 1.2, b: float = 0.75, analyzer=None) -> "OracleIndex":
        """rows: iterable of dicts with conv_id, turn_idx, text (and extras).

        doc_id = dense rank over (conv_id, turn_idx) — the engine's
        deterministic global ordinal (SURVEY.md §1.1 docID mapping).
        ``analyzer``: an analysis.Analyzer applied per doc (stop holes,
        stemming, synonyms); dl counts EMITTED tokens (FieldInvertState
        semantics) and positions keep the holes."""
        idx = cls(k1=k1, b=b)
        ordered = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
        for doc_id, r in enumerate(ordered):
            if analyzer is not None and not analyzer.is_noop():
                entries = analyzer.analyze_text(r.get("text"))
            else:
                entries = list(enumerate(tokenize_text(r.get("text"))))
                entries = [(t, p) for p, t in entries]
            norm = int(int_to_byte4(len(entries)))
            # OracleDoc.tokens keeps the emitted terms (dl = len(tokens))
            idx.docs.append(
                OracleDoc(
                    doc_id, r["conv_id"], int(r["turn_idx"]),
                    [t for t, _ in entries], norm,
                )
            )
            for t, pos in entries:
                idx.postings.setdefault(t, {})
                idx.postings[t][doc_id] = idx.postings[t].get(doc_id, 0) + 1
                idx.positions.setdefault(t, {}).setdefault(doc_id, []).append(pos)
        return idx

    # ---- collection statistics (global, field = "text") ----

    @property
    def doc_count(self) -> int:
        # Terms.getDocCount semantics: docs with at least one token in the
        # field (core/index/Terms.java:103-121) — empty turns are excluded
        # from docCount and avgdl, exactly like the reference.
        return sum(1 for d in self.docs if d.tokens)

    @property
    def sum_total_term_freq(self) -> int:
        return sum(len(d.tokens) for d in self.docs)

    @property
    def avgdl(self) -> np.float32:
        # double division, then cast to float (BM25Similarity.java:109-111)
        return np.float32(self.sum_total_term_freq / self.doc_count)

    def doc_freq(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> np.float32:
        n = self.doc_freq(term)
        N = self.doc_count
        return np.float32(math.log(1 + (N - n + 0.5) / (n + 0.5)))

    def norm_inverse_cache(self) -> np.ndarray:
        k1 = np.float32(self.k1)
        b = np.float32(self.b)
        avgdl = self.avgdl
        one = np.float32(1.0)
        cache = one / (k1 * ((one - b) + b * LENGTH_TABLE / avgdl))
        return cache.astype(np.float32)

    # ---- scoring ----

    def term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        """doc_id -> float32 BM25 score for a single term."""
        cache = self.norm_inverse_cache()
        weight = np.float32(np.float32(boost) * self.idf(term))
        out: dict[int, np.float32] = {}
        one = np.float32(1.0)
        for doc_id, freq in self.postings.get(term, {}).items():
            inv = cache[self.docs[doc_id].norm]
            score = weight - weight / (one + np.float32(freq) * inv)
            out[doc_id] = np.float32(score)
        return out

    def term_scores_classic(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        """ClassicSimilarity (TFIDFSimilarity.java:506-510): score =
        (sqrt(freq) * queryWeight) * normTable[norm]; queryWeight = boost *
        float32(log((docCount+1)/(docFreq+1)) + 1); normTable[i] =
        float32(1/sqrt(length_i)), slot 0 = 1f/normTable[255]."""
        N, n = self.doc_count, self.doc_freq(term)
        idf = np.float32(math.log((N + 1) / (n + 1)) + 1.0)
        qw = np.float32(np.float32(boost) * idf)
        table = np.zeros(256, dtype=np.float32)
        for i in range(1, 256):
            table[i] = np.float32(1.0 / math.sqrt(float(LENGTH_TABLE[i])))
        table[0] = np.float32(1.0) / table[255]
        out: dict[int, np.float32] = {}
        for doc_id, freq in self.postings.get(term, {}).items():
            tf = np.float32(math.sqrt(float(freq)))
            raw = np.float32(tf * qw)
            out[doc_id] = np.float32(raw * table[self.docs[doc_id].norm])
        return out

    def term_scores_lm(self, term: str, boost: float = 1.0, mu: float = 2000.0) -> dict[int, np.float32]:
        """LMDirichletSimilarity.java:35-41: double-math score clamped at 0,
        cast to float; p(t|C) = (ttf+1)/(sumTotalTermFreq+1); docLen is the
        byte4-decoded quantized length (SimilarityBase.getLengthValue)."""
        postings = self.postings.get(term, {})
        ttf = sum(postings.values())
        p = (ttf + 1.0) / (self.sum_total_term_freq + 1.0)
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            raw = float(boost) * (
                math.log(1 + freq / (mu * p)) + math.log(mu / (dl + mu))
            )
            out[doc_id] = np.float32(raw if raw > 0.0 else 0.0)
        return out

    def term_scores_lm_jm(self, term: str, boost: float = 1.0, lam: float = 0.1) -> dict[int, np.float32]:
        """LMJelinekMercerSimilarity.java:62-69: boost * ln(1 +
        ((1-λ)*freq/dl) / (λ*p(t|C))); same DefaultCollectionModel p."""
        postings = self.postings.get(term, {})
        ttf = sum(postings.values())
        p = (ttf + 1.0) / (self.sum_total_term_freq + 1.0)
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            raw = float(boost) * math.log(1 + ((1.0 - lam) * freq / dl) / (lam * p))
            out[doc_id] = np.float32(raw)
        return out

    def term_scores_dfr(self, term: str, boost: float = 1.0, c: float = 1.0) -> dict[int, np.float32]:
        """DFRSimilarity.java:106-110 with BasicModelG.java:36-50 +
        AfterEffectL (×1.0) + NormalizationH2.java:57-59:
        tfn = freq * log2(1 + c*avgdl/dl); λg = (ttf+1)/(N+ttf+1);
        score = boost * (B - (B-A)/(1+tfn))."""
        postings = self.postings.get(term, {})
        ttf = sum(postings.values())
        n_docs = float(self.doc_count)
        lam = (ttf + 1.0) / (n_docs + ttf + 1.0)
        ln2 = math.log(2.0)
        a2 = math.log(lam + 1.0) / ln2
        b2 = math.log((1.0 + lam) / lam) / ln2
        c_avgdl = c * (self.sum_total_term_freq / n_docs)
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            tfn = freq * math.log(1.0 + c_avgdl / dl) / ln2
            raw = float(boost) * (b2 - (b2 - a2) / (1.0 + tfn))
            out[doc_id] = np.float32(raw)
        return out

    def term_scores_ib(self, term: str, boost: float = 1.0, c: float = 1.0) -> dict[int, np.float32]:
        """IBSimilarity.java:95-98 with DistributionLL.java:33-34 +
        LambdaDF.java:32-38 (float λ intermediate) + NormalizationH2:
        tfn = freq * log2(1 + c*avgdl/dl); λ = float32((df+1)/(N+1));
        score = boost * -ln(λ/(tfn+λ))."""
        postings = self.postings.get(term, {})
        n_docs = float(self.doc_count)
        lam = float(np.float32((len(postings) + 1.0) / (n_docs + 1.0)))
        ln2 = math.log(2.0)
        c_avgdl = c * (self.sum_total_term_freq / n_docs)
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            tfn = freq * math.log(1.0 + c_avgdl / dl) / ln2
            raw = float(boost) * -math.log(lam / (tfn + lam))
            out[doc_id] = np.float32(raw)
        return out

    def term_scores_ax(self, term: str, boost: float = 1.0, s: float = 0.25, kk: float = 0.35) -> dict[int, np.float32]:
        """AxiomaticF2EXP (Axiomatic.java:95-106 composition; tf=ln=1,
        gamma=0): score = max(0, boost * freq/(freq + s + s*dl/avgdl) *
        ((N+1)/df)^k)."""
        postings = self.postings.get(term, {})
        n_docs = float(self.doc_count)
        avgdl = self.sum_total_term_freq / n_docs
        idf = math.pow((n_docs + 1.0) / len(postings), kk) if postings else 0.0
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            raw = float(boost) * (freq / (freq + s + s * dl / avgdl)) * idf
            out[doc_id] = np.float32(raw if raw > 0.0 else 0.0)
        return out

    def term_scores_ib_spl(self, term: str, boost: float = 1.0, c: float = 1.0) -> dict[int, np.float32]:
        """IBSimilarity with DistributionSPL.java:35-59 + LambdaDF + H2:
        tfn = freq * log2(1 + c*avgdl/dl); λ = float32((df+1)/(N+1));
        q = 1 - 1/(tfn+1); score = boost * -ln((λ^q - λ)/(1 - λ))."""
        postings = self.postings.get(term, {})
        n_docs = float(self.doc_count)
        lam = float(np.float32((len(postings) + 1.0) / (n_docs + 1.0)))
        ln2 = math.log(2.0)
        c_avgdl = c * (self.sum_total_term_freq / n_docs)
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            tfn = freq * math.log(1.0 + c_avgdl / dl) / ln2
            q = 1.0 - 1.0 / (tfn + 1.0)
            raw = float(boost) * -math.log(
                (math.pow(lam, q) - lam) / (1.0 - lam)
            )
            out[doc_id] = np.float32(raw)
        return out

    def term_scores_dfi(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        """DFISimilarity.java:77-87 + IndependenceStandardized.java:28-30:
        expected = (ttf+1)*dl/(sttf+1); 0 when freq <= expected; else
        boost * log2((freq-expected)/sqrt(expected) + 1)."""
        postings = self.postings.get(term, {})
        ttf = sum(postings.values())
        sttf = float(self.sum_total_term_freq)
        ef = (ttf + 1.0) / (sttf + 1.0)
        ln2 = math.log(2.0)
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            expected = ef * dl
            if freq <= expected:
                out[doc_id] = np.float32(0.0)
                continue
            measure = (freq - expected) / math.sqrt(expected)
            out[doc_id] = np.float32(
                float(boost) * math.log(measure + 1.0) / ln2
            )
        return out

    def term_scores_sweetspot(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        """SweetSpotSimilarity (misc/search/similarity/SweetSpotSimilarity
        .java) with the engine's configuration: baselineTf(base=1.5, min=2)
        * (ln((N+1)/(df+1)) + 1)^2 * plateau lengthNorm([6,20], s=0.5)."""
        postings = self.postings.get(term, {})
        if not postings:
            return {}
        df = len(postings)
        n_docs = float(self.doc_count)
        idf2 = (math.log((n_docs + 1.0) / (df + 1.0)) + 1.0) ** 2
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            tf = 1.5 if freq <= 2.0 else math.sqrt(freq + 1.5 * 1.5 - 2.0)
            ln = 1.0 / math.sqrt(
                0.5 * (abs(dl - 6.0) + abs(dl - 20.0) - 14.0) + 1.0
            )
            out[doc_id] = np.float32(float(boost) * idf2 * tf * ln)
        return out

    def term_scores_bool(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        """BooleanSimilarity.java:56-60: score = boost per matching doc."""
        return {
            doc_id: np.float32(float(boost))
            for doc_id in self.postings.get(term, {})
        }

    def term_scores_ax_variant(
        self, term: str, variant: str, boost: float = 1.0,
        s: float = 0.25, kk: float = 0.35, qlen: int = 1,
    ) -> dict[int, np.float32]:
        """Axiomatic F1/F2/F3 EXP/LOG variants (Axiomatic.java:96-106
        composition; per-variant components from AxiomaticF*.java):
        score = max(0, boost * (tf * ln * tfln * idf - gamma))."""
        postings = self.postings.get(term, {})
        n_docs = float(self.doc_count)
        avgdl = self.sum_total_term_freq / n_docs
        if not postings:
            return {}
        df = len(postings)
        idf = (
            math.pow((n_docs + 1.0) / df, kk)
            if variant.endswith("exp")
            else math.log((n_docs + 1.0) / df)
        )
        out: dict[int, np.float32] = {}
        for doc_id, freq in postings.items():
            dl = float(LENGTH_TABLE[self.docs[doc_id].norm])
            tf_c = 1.0 + math.log(1.0 + math.log(freq + 1.0))
            if variant in ("f1exp", "f1log"):
                ln_c = (avgdl + s) / (avgdl + dl * s)
                core = tf_c * ln_c * idf
            elif variant == "f2log":
                core = (freq / (freq + s + s * dl / avgdl)) * idf
            else:  # f3exp / f3log
                gamma = (dl - qlen) * s * qlen / avgdl
                core = tf_c * idf - gamma
            raw = float(boost) * core
            out[doc_id] = np.float32(raw if raw > 0.0 else 0.0)
        return out

    def search_or_lm(self, terms: list[str], k: int):
        per_term = [self.term_scores_lm(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_lm_jm(self, terms: list[str], k: int):
        per_term = [self.term_scores_lm_jm(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_dfr(self, terms: list[str], k: int):
        per_term = [self.term_scores_dfr(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_ib(self, terms: list[str], k: int):
        per_term = [self.term_scores_ib(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_ax(self, terms: list[str], k: int):
        per_term = [self.term_scores_ax(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_ib_spl(self, terms: list[str], k: int):
        per_term = [self.term_scores_ib_spl(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_dfi(self, terms: list[str], k: int):
        per_term = [self.term_scores_dfi(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_sweetspot(self, terms: list[str], k: int):
        per_term = [self.term_scores_sweetspot(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_bool(self, terms: list[str], k: int):
        per_term = [self.term_scores_bool(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_ax_variant(self, terms: list[str], variant: str, k: int):
        per_term = [self.term_scores_ax_variant(t, variant) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_or_classic(self, terms: list[str], k: int):
        per_term = [self.term_scores_classic(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def _sum_scores(self, per_term: list[dict[int, np.float32]], doc_ids) -> dict[int, np.float32]:
        out = {}
        for d in doc_ids:
            acc = 0.0  # float64 accumulator, cast at the end
            for ts in per_term:
                if d in ts:
                    acc += float(ts[d])
            out[d] = np.float32(acc)
        return out

    def search_or(self, terms: list[str], k: int) -> list[tuple[int, np.float32]]:
        """SHOULD-of-terms (BM25 default for multi-word query)."""
        per_term = [self.term_scores(t) for t in terms]
        doc_ids = set().union(*[set(ts) for ts in per_term]) if per_term else set()
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_and(self, terms: list[str], k: int) -> list[tuple[int, np.float32]]:
        """MUST conjunction, scores summed."""
        per_term = [self.term_scores(t) for t in terms]
        if not per_term:
            return []
        doc_ids = set(per_term[0])
        for ts in per_term[1:]:
            doc_ids &= set(ts)
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_not(self, must: list[str], must_not: list[str], k: int):
        per_term = [self.term_scores(t) for t in must]
        if not per_term:
            return []
        doc_ids = set(per_term[0])
        for ts in per_term[1:]:
            doc_ids &= set(ts)
        for t in must_not:
            doc_ids -= set(self.postings.get(t, {}))
        return self._topk(self._sum_scores(per_term, doc_ids), k)

    def search_phrase(self, terms: list[str], k: int,
                      positions: list[int] | None = None):
        """Exact phrase (slop=0): freq = number of phrase occurrences; scored
        like a term with the SUMMED idf of all phrase terms
        (``BM25Similarity.idfExplain(termStats[])`` sums idf in double then
        casts; ``PhraseWeight`` uses phrase freq).  ``positions`` = explicit
        query positions (stopword holes); None = consecutive."""
        if not terms:
            return []
        offs = list(positions) if positions else list(range(len(terms)))
        # sum per-term float32 idfs in double, then cast (idfExplain)
        idf = np.float32(sum(float(self.idf(t)) for t in terms))
        cache = self.norm_inverse_cache()
        one = np.float32(1.0)
        cands = set(self.positions.get(terms[0], {}))
        for t in terms[1:]:
            cands &= set(self.positions.get(t, {}))
        scores = {}
        for d in cands:
            first = self.positions[terms[0]][d]
            freq = 0
            for p in first:
                if all(
                    p + (offs[i] - offs[0]) in self.positions[t].get(d, ())
                    for i, t in enumerate(terms[1:], 1)
                ):
                    freq += 1
            if freq > 0:
                inv = cache[self.docs[d].norm]
                scores[d] = np.float32(idf - idf / (one + np.float32(freq) * inv))
        return self._topk(scores, k)

    def search_sloppy_phrase(self, terms: list[str], slop: int, k: int,
                             positions: list[int] | None = None):
        """Sloppy phrase with exact reference semantics: freq = float32
        Σ 1/(1+matchLength) over the greedy SloppyPhraseMatcher traversal
        (SloppyPhraseMatcher.java:172-204, PhraseScorer.java:76-84),
        simulated per doc by lucene_spark.search.sloppy.sloppy_freq."""
        from lucene_spark.search.sloppy import sloppy_freq

        if not terms:
            return []
        offs = list(positions) if positions else list(range(len(terms)))
        idf = np.float32(sum(float(self.idf(t)) for t in terms))
        cache = self.norm_inverse_cache()
        one = np.float32(1.0)
        cands = set(self.positions.get(terms[0], {}))
        for t in terms[1:]:
            cands &= set(self.positions.get(t, {}))
        scores = {}
        for d in cands:
            plists = [self.positions[t][d] for t in terms]
            freq = sloppy_freq(plists, offs, slop, f32=True)
            if freq > 0:
                scores[d] = np.float32(
                    idf - idf / (one + np.float32(freq) * cache[self.docs[d].norm])
                )
        return self._topk(scores, k)

    def search_multi_phrase(self, slots, k: int, slop: int = 0,
                            positions: list[int] | None = None):
        """MultiPhraseQuery: each slot admits alternative terms; slot
        positions = union of the alternatives' position lists; weight sums
        idf over every (known) alternative (MultiPhraseWeight).  slop=0
        counts aligned start positions; slop>0 runs the SloppyPhraseMatcher
        simulation over the union lists with ``terms_per_pp`` so slots
        sharing alternatives form multi-term repeat groups
        (SloppyPhraseMatcher.java:427-460, LUCENE-3821 shipped behavior)."""
        from lucene_spark.search.sloppy import sloppy_freq

        slots = [tuple(dict.fromkeys(ts)) for ts in slots]
        if not slots:
            return []
        offs = list(positions) if positions else list(range(len(slots)))
        slot_terms = []
        for ts in slots:
            known = [t for t in ts if t in self.postings]
            if not known:
                return []
            slot_terms.append(known)
        flat = [t for ts in slot_terms for t in ts]
        idf = np.float32(sum(float(self.idf(t)) for t in flat))
        cache = self.norm_inverse_cache()
        one = np.float32(1.0)
        cands = None
        for ts in slot_terms:
            ds = set()
            for t in ts:
                ds |= set(self.positions.get(t, {}))
            cands = ds if cands is None else (cands & ds)
        scores = {}
        for d in cands or ():
            plists = [
                sorted({p for t in ts for p in self.positions[t].get(d, ())})
                for ts in slot_terms
            ]
            if slop > 0 and len(slot_terms) >= 2:
                freq = sloppy_freq(
                    plists, offs, slop, f32=True, terms_per_pp=slot_terms
                )
            else:
                freq = sum(
                    1
                    for p in plists[0]
                    if all(
                        p + (offs[i] - offs[0]) in plists[i]
                        for i in range(1, len(plists))
                    )
                )
            if freq > 0:
                scores[d] = np.float32(
                    idf - idf / (one + np.float32(freq) * cache[self.docs[d].norm])
                )
        return self._topk(scores, k)

    def _topk(self, scores: dict[int, np.float32], k: int):
        items = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, s) for d, s in items[:k]]

    def topk_keys(self, hits) -> list[tuple[str, int, float]]:
        return [
            (self.docs[d].conv_id, self.docs[d].turn_idx, float(s)) for d, s in hits
        ]
