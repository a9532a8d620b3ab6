"""TermAutomatonQuery — a proximity query whose transitions are terms.

Reference: sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java:63 (builder API: createState/setAccept/
addTransition/addAnyTransition/finish) and TermAutomatonScorer.java:229
(countMatches — the per-document position/state dynamic program).

Semantics replicated exactly:

* ``finish()`` validates that no ANY transition leaves the initial state
  and none enters an accept state (TermAutomatonQuery.java:186-209), then
  rewrites ANY arcs to also match every real term
  (TermAutomatonQuery.java:211-248) and DETERMINIZES the automaton
  (subset construction — Operations.determinize).  An automaton that
  accepts the empty string raises (testEmptyString).
* Matching visits any document containing ANY of the automaton's terms
  (a disjunction, per the class javadoc), gathers the per-term position
  arrays, and runs the countMatches DP: a per-position LIST of DFA
  states (PosState.add appends WITHOUT dedup — converging paths keep
  their multiplicity, TermAutomatonScorer.java:399-404); each term event
  steps the states at its position AND restarts from the initial state;
  a step landing on an accept state increments freq (term steps only —
  ANY gap-advancement steps never count, :289-299 vs :316-337).
* Score = BM25(freq, norm) with weight = boost * Σ idf over the distinct
  automaton terms that exist in the index (TermAutomatonQuery.java:
  376-397: one SimScorer over all TermStatistics with docFreq > 0).

Spark-first shape: the candidate relation is ONE groupBy gather of the
terms' postings (single shuffle); the DP runs per candidate document in
an Arrow-batched pandas UDF (like the generic sloppy-phrase matcher);
scoring stays a JVM expression.
"""

from __future__ import annotations

from dataclasses import dataclass, field

ANY = -1  # the anyTermID label


@dataclass
class TermAutomatonQuery:
    """Builder-style automaton query (field is implicitly the text field).

    Usage mirrors the reference::

        q = TermAutomatonQuery()
        init = q.create_state(); s1 = q.create_state()
        q.add_transition(init, s1, "comes")
        s2 = q.create_state(); q.add_any_transition(s1, s2)
        s3 = q.create_state(); q.set_accept(s3, True)
        q.add_transition(s2, s3, "sun")
        q.finish()
    """

    boost: float = 1.0
    _num_states: int = 0
    _accept: set = field(default_factory=set)
    # (source, dest, term_id); term_id == ANY for any-transitions
    _transitions: list = field(default_factory=list)
    _term_to_id: dict = field(default_factory=dict)
    _id_to_term: dict = field(default_factory=dict)
    _finished: bool = False
    # populated by finish(): DFA as dict[(state, label)] -> state,
    # accepts: set of DFA states, start state = 0
    _dfa_step: dict = field(default_factory=dict)
    _dfa_accept: set = field(default_factory=set)

    def rewrite(self) -> "TermAutomatonQuery":
        # Query.rewrite contract (search/query.py Query.rewrite); the
        # reference rewrites single-path automatons to Term/PhraseQuery
        # (TermAutomatonQuery.rewrite) — we keep the general scorer, whose
        # DP reduces to the same freq for those shapes.
        return self

    def create_state(self) -> int:
        s = self._num_states
        self._num_states += 1
        return s

    def set_accept(self, state: int, accept: bool) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def add_transition(self, source: int, dest: int, term: str) -> None:
        if term is None:
            raise ValueError("term should not be null")
        tid = self._term_to_id.setdefault(term, len(self._term_to_id))
        self._id_to_term[tid] = term
        self._transitions.append((source, dest, tid))

    def add_any_transition(self, source: int, dest: int) -> None:
        self._transitions.append((source, dest, ANY))

    @property
    def terms(self) -> list[str]:
        return [self._id_to_term[i] for i in sorted(self._id_to_term)]

    @property
    def has_any(self) -> bool:
        return any(t == ANY for _, _, t in self._transitions)

    def finish(self) -> "TermAutomatonQuery":
        """Validate + determinize (TermAutomatonQuery.finish)."""
        # leading / trailing ANY validation (finish():186-209)
        for src, dest, tid in self._transitions:
            if tid == ANY and src == 0:
                raise ValueError("automaton cannot lead with an ANY transition")
            if tid == ANY and dest in self._accept:
                raise ValueError("automaton cannot end with an ANY transition")

        # NFA adjacency: state -> list[(label, dest)]
        adj: dict[int, list] = {}
        for src, dest, tid in self._transitions:
            adj.setdefault(src, []).append((tid, dest))

        def nfa_step(states, label):
            """label is a real term id or ANY.  Real-term events traverse
            both their own arcs AND ANY arcs (the finish() rewrite that
            makes ANY match every term); the ANY label traverses ANY arcs
            only (gap advancement)."""
            out = set()
            for s in states:
                for lab, d in adj.get(s, ()):
                    if lab == label or (lab == ANY and label != ANY):
                        out.add(d)
                    elif lab == ANY and label == ANY:
                        out.add(d)
            return frozenset(out)

        labels = sorted(self._id_to_term) + ([ANY] if self.has_any else [])
        start = frozenset([0])
        if self._accept & start:
            # Operations.determinize of an automaton accepting "" — the
            # scorer has no empty-string notion (testEmptyString)
            raise ValueError("automaton accepts the empty string")
        ids = {start: 0}
        order = [start]
        step: dict = {}
        i = 0
        while i < len(order):
            cur = order[i]
            for lab in labels:
                nxt = nfa_step(cur, lab)
                if not nxt:
                    continue
                if nxt not in ids:
                    ids[nxt] = len(order)
                    order.append(nxt)
                step[(ids[cur], lab)] = ids[nxt]
            i += 1
        self._dfa_step = step
        self._dfa_accept = {
            ids[s] for s in order if s & self._accept
        }
        if not self._dfa_accept:
            # no reachable accept state: matches nothing, but finish()
            # itself succeeds in the reference; keep the empty DFA
            pass
        self._finished = True
        return self

    # -- the countMatches dynamic program --------------------------------
    def doc_freq_fn(self):
        """Returns a picklable function(list_of_position_lists) -> freq,
        where the i-th list holds the doc's positions of term id i (None /
        [] when absent).  Faithful port of TermAutomatonScorer.countMatches
        (TermAutomatonScorer.java:229-346) including the no-dedup PosState
        multiplicity and the ANY 'petered out' cutoff."""
        if not self._finished:
            raise ValueError("call finish() first")
        stepd = dict(self._dfa_step)
        accept = set(self._dfa_accept)
        has_any = self.has_any
        n_terms = len(self._id_to_term)

        def freq_of(pos_lists):
            events = []
            for tid in range(n_terms):
                pl = pos_lists[tid] if tid < len(pos_lists) else None
                if pl:
                    events.extend((int(p), tid) for p in pl)
            if not events:
                return 0
            events.sort()
            positions: dict[int, list] = {}
            freq = 0
            last_pos = -1
            for pos, tid in events:
                if last_pos != -1 and has_any:
                    start_last = last_pos
                    lp = last_pos
                    while lp < pos:
                        sts = positions.get(lp, ())
                        if not sts and lp > start_last:
                            break
                        nxt = positions.setdefault(lp + 1, [])
                        for s in sts:
                            d = stepd.get((s, ANY))
                            if d is not None:
                                nxt.append(d)
                        lp += 1
                cur = positions.get(pos, ())
                nxt = positions.setdefault(pos + 1, [])
                for s in cur:
                    d = stepd.get((s, tid))
                    if d is not None:
                        nxt.append(d)
                        if d in accept:
                            freq += 1
                d = stepd.get((0, tid))
                if d is not None:
                    nxt.append(d)
                    if d in accept:
                        freq += 1
                last_pos = pos
            return freq

        return freq_of
