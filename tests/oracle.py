"""Pure-Python BM25 oracle — an independent reimplementation of the
scoring contract (SURVEY.md §2.9) used to verify the Spark engine
rank-for-rank and score-for-score.

Deliberately shares NO code path with the Spark engine except the
analyzer and the bm25 constants module (which both sides must agree on
by definition): postings are plain dicts, scoring is plain loops.
It stands in for tantivy golden files, which cannot be produced in this
sandbox (no network, no Rust toolchain); the formulas mirror public
tantivy 0.18 behavior as documented in SURVEY.md §2.9.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from sonar_tantivy_spark.analyzer import tokenize
from sonar_tantivy_spark.functions import bm25
from sonar_tantivy_spark.plans import ast as A


class OracleIndex:
    def __init__(self, docs: list[dict], field_tokenizers: dict[str, str]):
        """docs: stored rows in docid order (docid = list position)."""
        self.docs = docs
        self.N = len(docs)
        self.field_tokenizers = field_tokenizers
        # postings[(field, term)] = {docid: [positions]}
        self.postings: dict[tuple[str, str], dict[int, list[int]]] = defaultdict(dict)
        self.doclen: dict[tuple[str, int], int] = {}
        self.total_tokens: Counter = Counter()
        for docid, doc in enumerate(docs):
            for field, tok in field_tokenizers.items():
                val = doc.get(field)
                if val is None:
                    continue
                pairs = tokenize(str(val), tok)
                self.doclen[(field, docid)] = len(pairs)
                self.total_tokens[field] += len(pairs)
                for term, pos in pairs:
                    self.postings[(field, term)].setdefault(docid, []).append(pos)

    def avgdl(self, field: str) -> float:
        return self.total_tokens[field] / self.N if self.N else 1.0

    def idf(self, field: str, term: str) -> float:
        return bm25.idf(len(self.postings.get((field, term), {})), self.N)

    def _dl(self, field: str, docid: int) -> float:
        raw = self.doclen.get((field, docid), 0)
        return float(bm25.decode_fieldnorm(bm25.fieldnorm_id(raw)))

    def _score_term(self, field: str, term: str) -> dict[int, float]:
        plist = self.postings.get((field, term), {})
        idf = self.idf(field, term)
        avgdl = self.avgdl(field)
        return {
            d: bm25.score(len(pp), self._dl(field, d), avgdl, idf)
            for d, pp in plist.items()
        }

    def score(self, node: A.Node) -> dict[int, float]:
        """docid → score for every matching doc."""
        if isinstance(node, A.TermQ):
            return self._score_term(node.field, node.term)
        if isinstance(node, A.PhraseQ):
            return self._score_phrase(node)
        if isinstance(node, A.BoolQ):
            return self._score_bool(node)
        if isinstance(node, A.FuzzyQ):
            return self._score_fuzzy(node)
        if isinstance(node, A.RegexQ):
            return self._score_regex(node)
        if isinstance(node, A.RangeQ):
            return self._score_range(node)
        if isinstance(node, A.AllQ):
            return {d: 1.0 for d in range(self.N)}
        if isinstance(node, A.PrefixQ):
            return self._score_prefix(node)
        if isinstance(node, A.TermSetQ):
            out: dict[int, float] = {}
            for t in node.terms:
                for d in self.postings.get((node.field, t), {}):
                    out[d] = 1.0
            return out
        if isinstance(node, A.ExistsQ):
            return {d: 1.0 for (f, _t), pl in self.postings.items()
                    if f == node.field for d in pl}
        if isinstance(node, A.IdsQ):
            return {d: 1.0 for d in node.values if 0 <= d < self.N}
        if isinstance(node, A.DisMaxQ):
            subs = [self.score(c) for c in node.queries]
            out = {}
            for d in set().union(*(set(s) for s in subs)):
                vals = [s[d] for s in subs if d in s]
                out[d] = max(vals) + node.tie_breaker * (sum(vals) - max(vals))
            return out
        if isinstance(node, A.PhrasePrefixQ):
            return self._score_phrase_prefix(node)
        if isinstance(node, A.SpanNearQ):
            return self._score_span(node)
        if isinstance(node, A.SpanFirstQ):
            return self._score_span(node.child, first_end=node.end)
        if isinstance(node, A.SpanNotQ):
            return self._score_span_not(node)
        if isinstance(node, A.SpanContainQ):
            return self._score_span_contain(node)
        if isinstance(node, A.CombinedFieldsQ):
            return self._score_combined_fields(node)
        if isinstance(node, A.PinnedQ):
            live = [d for d in node.ids if 0 <= d < self.N]
            out = {d: s for d, s in self.score(node.organic).items()
                   if d not in set(live)}
            for i, d in enumerate(live):
                out[d] = A.PINNED_BASE / (1.0 + i)
            return out
        if isinstance(node, A.ScriptScoreQ):
            return self._score_script_score(node)
        if isinstance(node, A.RankFeatureQ):
            return self._score_rank_feature(node)
        if isinstance(node, A.DistanceFeatureQ):
            return self._score_distance_feature(node)
        if isinstance(node, A.BoostQ):
            return {d: s * node.boost for d, s in self.score(node.child).items()}
        if isinstance(node, A.ConstScoreQ):
            return {d: node.boost for d in self.score(node.child)}
        if isinstance(node, A.FunctionScoreQ):
            return self._score_function(node)
        if isinstance(node, A.BoostingQ):
            pos = self.score(node.positive)
            neg = self.score(node.negative)
            return {d: (s * node.negative_boost if d in neg else s)
                    for d, s in pos.items()}
        raise NotImplementedError(type(node).__name__)

    def _fn_value(self, fn: dict, docid: int) -> float:
        import math

        v = self.docs[docid].get(fn["field"])
        if fn["kind"] == "random_score":
            # mirror the engine's overflow pin: value/seed mod 2^31,
            # per-product mod 2^32 (identical for in-range inputs)
            iv = (int(v) if v is not None else 0) % 2147483648
            sp = (fn["seed"] % 2147483648) * 2246822519 % 4294967296
            mix = (iv * 2654435761 % 4294967296 + sp) % 4294967296
            return mix / 4294967296.0
        if fn["kind"] == "field_value_factor":
            x = fn["factor"] * (float(v) if v is not None else fn["missing"])
            if fn["modifier"] == "log1p":
                return math.log(1.0 + x)
            if fn["modifier"] == "sqrt":
                return math.sqrt(x)
            return x
        if v is None:
            return 1.0  # neutral, matching the engine's pinned choice
        fv = v.timestamp() if hasattr(v, "timestamp") else float(v)
        o = (fn["origin"].timestamp() if hasattr(fn["origin"], "timestamp")
             else float(fn["origin"]))
        sigma2 = -(fn["scale"] ** 2) / (2.0 * math.log(fn["decay"]))
        dist = max(abs(fv - o) - fn["offset"], 0.0)
        return math.exp(-(dist * dist) / (2.0 * sigma2))

    def _score_function(self, node: A.FunctionScoreQ) -> dict[int, float]:
        base = self.score(node.child)
        out: dict[int, float] = {}
        for d, s in base.items():
            fs = self._fn_value(node.functions[0], d)
            for fn in node.functions[1:]:
                v = self._fn_value(fn, d)
                fs = fs * v if node.score_mode == "multiply" else fs + v
            if node.boost_mode == "multiply":
                out[d] = s * fs
            elif node.boost_mode == "sum":
                out[d] = s + fs
            else:
                out[d] = fs
        return out

    def _score_phrase_prefix(self, node: A.PhrasePrefixQ) -> dict[int, float]:
        """Exact adjacency over the chain terms, final slot = any
        dictionary term with the prefix; constant score 1.0
        (search.py _cand_phrase_prefix semantics)."""
        terms = node.terms
        plists = [self.postings.get((node.field, t), {}) for t in terms]
        # positions of ANY prefix-matching term, per doc
        pp: dict[int, set[int]] = defaultdict(set)
        for (field, term), plist in self.postings.items():
            if field == node.field and term.startswith(node.prefix):
                for d, poss in plist.items():
                    pp[d].update(poss)
        common = set(plists[0]) if plists else set()
        for pl in plists[1:]:
            common &= set(pl)
        common &= set(pp)
        out: dict[int, float] = {}
        for d in common:
            match = set(plists[0][d])
            for i in range(1, len(terms)):
                match = {p + 1 for p in match} & set(plists[i][d])
            match = {p + 1 for p in match} & pp[d]
            if match:
                out[d] = 1.0
        return out

    def _score_phrase(self, node: A.PhraseQ) -> dict[int, float]:
        terms = node.terms
        if not terms:
            return {}
        if len(terms) == 1:
            return self._score_term(node.field, terms[0])
        plists = [self.postings.get((node.field, t), {}) for t in terms]
        common = set(plists[0])
        for pl in plists[1:]:
            common &= set(pl)
        idf_sum = sum(self.idf(node.field, t) for t in terms)
        avgdl = self.avgdl(node.field)
        slop = int(getattr(node, "slop", 0) or 0)
        out = {}
        for d in common:
            match = set(plists[0][d])
            for i in range(1, len(terms)):
                if slop == 0:
                    match = {p + 1 for p in match} & set(plists[i][d])
                elif getattr(node, "in_order", True):
                    # ordered within-window: q survives iff some prior
                    # position p has p < q <= p + 1 + slop
                    match = {
                        q for q in plists[i][d]
                        if any(p < q <= p + 1 + slop for p in match)
                    }
                else:
                    # transposing window (Lucene 2-term rule):
                    # |q - (p + 1)| <= slop and q != p
                    match = {
                        q for q in plists[i][d]
                        if any(q != p and abs(q - p - 1) <= slop
                               for p in match)
                    }
            if match:
                out[d] = bm25.score(len(match), self._dl(node.field, d), avgdl, idf_sum)
        return out

    def _score_span(self, node: A.SpanNearQ,
                    first_end: int | None = None) -> dict[int, float]:
        """span_near/span_or/span_term (+ span_first via ``first_end``):
        the phrase scorer generalized to per-clause alternative unions,
        same per-adjacent-pair windows, tf = surviving final positions,
        idf = sum over LIVE (df > 0) alternatives — the engine's
        _cand_span semantics, independently re-derived."""
        field = node.field
        live = []
        for c in node.clauses:
            alts = [t for t in dict.fromkeys(c)
                    if self.postings.get((field, t), {})]
            if not alts:
                return {}
            live.append(alts)
        if not live:
            return {}

        def cpos(alts, d):
            out: set[int] = set()
            for t in alts:
                out |= set(self.postings.get((field, t), {}).get(d, []))
            return out

        docs = set()
        for t in live[0]:
            docs |= set(self.postings.get((field, t), {}))
        for alts in live[1:]:
            docs &= {d for t in alts
                     for d in self.postings.get((field, t), {})}
        slop = int(node.slop or 0)
        idf_sum = sum(self.idf(field, t) for alts in live for t in alts)
        avgdl = self.avgdl(field)
        out: dict[int, float] = {}
        for d in docs:
            match = cpos(live[0], d)
            for alts in live[1:]:
                if node.in_order:
                    match = {q for q in cpos(alts, d)
                             if any(p < q <= p + 1 + slop for p in match)}
                else:
                    match = {q for q in cpos(alts, d)
                             if any(q != p and abs(q - p - 1) <= slop
                                    for p in match)}
            if first_end is not None:
                match = {q for q in match if q + 1 <= first_end}
            if match:
                out[d] = bm25.score(len(match), self._dl(field, d),
                                    avgdl, idf_sum)
        return out

    def _score_span_not(self, node: A.SpanNotQ) -> dict[int, float]:
        """span_not (single-clause include/exclude): include position p
        survives iff no exclude position q in [p - pre, p + post];
        tf = survivors, idf = live INCLUDE alternatives only."""
        field = node.field
        inc = [t for t in dict.fromkeys(node.include)
               if self.postings.get((field, t), {})]
        if not inc:
            return {}
        exc = [t for t in dict.fromkeys(node.exclude)
               if self.postings.get((field, t), {})]

        def upos(alts, d):
            out: set[int] = set()
            for t in alts:
                out |= set(self.postings.get((field, t), {}).get(d, []))
            return out

        docs = set()
        for t in inc:
            docs |= set(self.postings.get((field, t), {}))
        idf_sum = sum(self.idf(field, t) for t in inc)
        avgdl = self.avgdl(field)
        out: dict[int, float] = {}
        for d in docs:
            ex = upos(exc, d)
            match = {p for p in upos(inc, d)
                     if not any(p - node.pre <= q <= p + node.post
                                for q in ex)}
            if match:
                out[d] = bm25.score(len(match), self._dl(field, d),
                                    avgdl, idf_sum)
        return out

    def _score_span_contain(self, node: "A.SpanContainQ") \
            -> dict[int, float]:
        """span_containing / span_within: the big side is a RIGID
        (slop 0, ordered) chain, so a surviving final position q spans
        exactly [q-(k-1), q]; little is a single alternatives union.
        containing: tf = big spans enclosing >= 1 little position, idf
        over big's live alternatives; within: tf = little positions
        inside >= 1 big span, idf over little — the engine's
        _cand_span_contain semantics, independently re-derived."""
        field = node.field
        blive = []
        for c in node.big.clauses:
            alts = [t for t in dict.fromkeys(c)
                    if self.postings.get((field, t), {})]
            if not alts:
                return {}
            blive.append(alts)
        little = [t for t in dict.fromkeys(node.little)
                  if self.postings.get((field, t), {})]
        if not little:
            return {}

        def upos(alts, d):
            out: set[int] = set()
            for t in alts:
                out |= set(self.postings.get((field, t), {}).get(d, []))
            return out

        docs = set()
        for t in blive[0]:
            docs |= set(self.postings.get((field, t), {}))
        for alts in blive[1:] + [little]:
            docs &= {d for t in alts
                     for d in self.postings.get((field, t), {})}
        k = len(blive)
        if node.mode == "containing":
            idf_sum = sum(self.idf(field, t)
                          for alts in blive for t in alts)
        else:
            idf_sum = sum(self.idf(field, t) for t in little)
        avgdl = self.avgdl(field)
        out: dict[int, float] = {}
        for d in docs:
            bmatch = upos(blive[0], d)
            for alts in blive[1:]:
                bmatch = {q for q in upos(alts, d) if q - 1 in bmatch}
            lpos = upos(little, d)
            if node.mode == "containing":
                match = {q for q in bmatch
                         if any(q - (k - 1) <= p <= q for p in lpos)}
            else:
                match = {p for p in lpos
                         if any(q - (k - 1) <= p <= q for q in bmatch)}
            if match:
                out[d] = bm25.score(len(match), self._dl(field, d),
                                    avgdl, idf_sum)
        return out

    def _score_combined_fields(self, node: "A.CombinedFieldsQ") \
            -> dict[int, float]:
        """combined_fields (BM25F, CombinedFieldsQ docstring): per doc
        and term, blended tf = Σ_f w_f·tf_f; blended dl = Σ_f w_f times
        the QUANTIZED per-field norm over all queried fields the doc
        has tokens in; blended avgdl = Σ_f w_f·avgdl_f; idf from the
        exact any-field df.  Plain loops, no engine code."""
        if not node.terms:
            return {}
        avgdl_b = sum(w * self.avgdl(f) for f, w in node.fields)
        per_term: dict[str, dict[int, float]] = {}
        idfs: dict[str, float] = {}
        for t in node.terms:
            btf: dict[int, float] = {}
            docs_any: set[int] = set()
            for f, w in node.fields:
                for d, pp in self.postings.get((f, t), {}).items():
                    btf[d] = btf.get(d, 0.0) + w * len(pp)
                    docs_any.add(d)
            per_term[t] = btf
            idfs[t] = bm25.idf(len(docs_any), self.N)
        if node.operator == "and":
            live = [set(per_term[t]) for t in node.terms]
            matched = set.intersection(*live) if live else set()
        else:
            matched = set().union(*(set(per_term[t])
                                    for t in node.terms))
            if node.min_should > 0:
                matched = {d for d in matched
                           if sum(1 for t in node.terms
                                  if d in per_term[t])
                           >= node.min_should}
        bdl: dict[int, float] = {}
        for d in matched:
            bdl[d] = sum(w * self._dl(f, d) for f, w in node.fields
                         if (f, d) in self.doclen)
        out: dict[int, float] = {}
        for d in matched:
            s = 0.0
            for t in node.terms:
                tf = per_term[t].get(d, 0.0)
                if tf <= 0.0:
                    continue
                denom = tf + bm25.K1 * (1.0 - bm25.B
                                        + bm25.B * bdl[d] / avgdl_b)
                s += idfs[t] * (bm25.K1 + 1.0) * tf / denom
            out[d] = s
        return out

    def _score_script_score(self, node: "A.ScriptScoreQ") \
            -> dict[int, float]:
        """script_score: per-doc evaluation of the arithmetic subset
        over _score + numeric fields — an independent Python ast walk
        (null fields read 0.0, division by zero -> 0.0, the engine's
        pinned gap rule)."""
        import ast as pyast
        tree = pyast.parse(node.script, mode="eval")
        base = self.score(node.child)

        def ev(n, env):
            if isinstance(n, pyast.Expression):
                return ev(n.body, env)
            if isinstance(n, pyast.Constant):
                return float(n.value)
            if isinstance(n, pyast.Name):
                return env[n.id]
            if isinstance(n, pyast.UnaryOp):
                v = ev(n.operand, env)
                return None if v is None else -v
            a, b = ev(n.left, env), ev(n.right, env)
            if a is None or b is None:
                return None
            if isinstance(n.op, pyast.Add):
                return a + b
            if isinstance(n.op, pyast.Sub):
                return a - b
            if isinstance(n.op, pyast.Mult):
                return a * b
            if isinstance(n.op, pyast.Div):
                return a / b if b else None
            if isinstance(n.op, pyast.Mod):
                # C-style remainder (sign of the dividend) — the
                # engine's try_mod; Python's % floor-mod differs on
                # negative operands
                import math as _m
                return _m.fmod(a, b) if b else None
            # negative base ** fractional exponent → complex in Python,
            # NaN in Spark: both fold to the 0.0 gap rule
            r = a ** b
            if isinstance(r, complex) or r != r:
                return None
            return float(r)

        out: dict[int, float] = {}
        for d, s in base.items():
            env = {"_score": s}
            for f in node.fields:
                raw = self.docs[d].get(f)
                env[f] = float(raw) if raw is not None else 0.0
            v = ev(tree, env)
            out[d] = 0.0 if v is None else float(v)
        return out

    def _score_rank_feature(self, node: "A.RankFeatureQ") \
            -> dict[int, float]:
        """rank_feature: every doc with a value matches; score =
        boost · S(max(v, 0)) — the engine's _cand_rank_feature math,
        independently re-derived."""
        import math
        out: dict[int, float] = {}
        for d, doc in enumerate(self.docs):
            raw = doc.get(node.field)
            if raw is None:
                continue
            v = max(float(raw), 0.0)
            if node.fn == "saturation":
                s = v / (v + node.pivot)
            elif node.fn == "log":
                s = math.log(node.scaling_factor + v)
            elif node.fn == "sigmoid":
                s = v ** node.exponent / (v ** node.exponent
                                          + node.pivot ** node.exponent)
            else:
                s = v
            out[d] = node.boost * s
        return out

    def _score_distance_feature(self, node: "A.DistanceFeatureQ") \
            -> dict[int, float]:
        """distance_feature: boost · pivot / (pivot + |v − origin|);
        dates in epoch seconds."""
        import pandas as pd
        if node.is_date:
            origin = pd.Timestamp(node.origin).timestamp()
        else:
            origin = float(node.origin)
        out: dict[int, float] = {}
        for d, doc in enumerate(self.docs):
            raw = doc.get(node.field)
            if raw is None:
                continue
            v = (pd.Timestamp(raw).timestamp() if node.is_date
                 else float(raw))
            out[d] = node.boost * node.pivot \
                / (node.pivot + abs(v - origin))
        return out

    def _score_prefix(self, node: A.PrefixQ) -> dict[int, float]:
        """Constant-score 1.0 for every doc holding >= 1 dictionary term
        with the prefix (search.py _cand_prefix semantics)."""
        out: dict[int, float] = {}
        for (field, term), plist in self.postings.items():
            if field == node.field and term.startswith(node.prefix):
                for d in plist:
                    out[d] = 1.0
        return out

    def _score_bool(self, node: A.BoolQ) -> dict[int, float]:
        musts = [self.score(c) for c in node.must]
        shoulds = [self.score(c) for c in node.should]
        mnots = [self.score(c) for c in node.must_not]
        msm = int(getattr(node, "min_should", 0) or 0)
        smc: dict[int, int] = defaultdict(int)
        for s in shoulds:
            for d in s:
                smc[d] += 1
        filt: set | None = None
        if getattr(node, "filter", []):
            fs = [self.score(c) for c in node.filter]
            filt = set(fs[0])
            for f in fs[1:]:
                filt &= set(f)
        if musts:
            keys = set(musts[0])
            for m in musts[1:]:
                keys &= set(m)
            if filt is not None:
                keys &= filt
            out = {d: sum(m[d] for m in musts) for d in keys}
            for s in shoulds:
                for d in list(out):
                    if d in s:
                        out[d] += s[d]
        elif shoulds and filt is not None and msm == 0:
            # Lucene: a required (filter) clause makes shoulds optional;
            # filters contribute no score
            out = {d: sum(s.get(d, 0.0) for s in shoulds) for d in filt}
        elif shoulds:
            out = defaultdict(float)
            for s in shoulds:
                for d, v in s.items():
                    out[d] += v
            out = dict(out)
            if filt is not None:
                out = {d: v for d, v in out.items() if d in filt}
        elif filt is not None:
            out = {d: 0.0 for d in filt}
        else:
            return {}
        if msm > 0:
            out = {d: v for d, v in out.items() if smc[d] >= msm}
        for mn in mnots:
            for d in mn:
                out.pop(d, None)
        return out

    def _lev(self, a: str, b: str, transposition: bool = False) -> int:
        """Levenshtein; with ``transposition`` an adjacent swap costs 1
        (OSA / restricted Damerau).  Independent of the engine's
        functions/strdist.py on purpose — different loop structure."""
        if abs(len(a) - len(b)) > 3:
            return 99
        rows = [list(range(len(b) + 1))]
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                v = min(rows[-1][j] + 1, cur[j - 1] + 1,
                        rows[-1][j - 1] + (ca != cb))
                if (transposition and i > 1 and j > 1
                        and ca == b[j - 2] and a[i - 2] == cb):
                    v = min(v, rows[-2][j - 2] + 1)
                cur.append(v)
            rows.append(cur)
            if len(rows) > 3:
                rows.pop(0)
        return rows[-1][-1]

    def _score_fuzzy(self, node: A.FuzzyQ) -> dict[int, float]:
        out: dict[int, float] = {}
        pfx = node.term[:getattr(node, "prefix_length", 0)]
        for (field, term), plist in self.postings.items():
            if field != node.field or not term.startswith(pfx):
                continue
            if self._lev(term, node.term, node.transposition) <= node.distance:
                for d in plist:
                    out[d] = 1.0
        return out

    def _score_regex(self, node: A.RegexQ) -> dict[int, float]:
        import re

        pat = re.compile(node.pattern)
        out: dict[int, float] = {}
        for (field, term), plist in self.postings.items():
            if field == node.field and pat.fullmatch(term):
                for d in plist:
                    out[d] = 1.0
        return out

    def _score_range(self, node: A.RangeQ) -> dict[int, float]:
        import pandas as pd

        def cv(b, v):
            # engine rule: string bounds on a date field cast to
            # timestamp (search.py _cand_range)
            return (pd.Timestamp(b)
                    if isinstance(b, str) and isinstance(v, pd.Timestamp)
                    else b)

        out = {}
        for d, doc in enumerate(self.docs):
            v = doc.get(node.field)
            if v is None:
                continue
            node = A.RangeQ(node.field, gte=cv(node.gte, v),
                            gt=cv(node.gt, v), lte=cv(node.lte, v),
                            lt=cv(node.lt, v))
            if node.gte is not None and not (v >= node.gte):
                continue
            if node.gt is not None and not (v > node.gt):
                continue
            if node.lte is not None and not (v <= node.lte):
                continue
            if node.lt is not None and not (v < node.lt):
                continue
            out[d] = 1.0
        return out

    def top_k(self, node: A.Node, k: int = 10,
              sort_by: str | None = None) -> list[tuple[int, float]]:
        scores = self.score(node)
        if sort_by:
            items = sorted(
                scores.items(),
                key=lambda kv: (self.docs[kv[0]].get(sort_by), -kv[0]),
                reverse=True,
            )[:k]
            # sorted collector emits the fast-field value as the score
            # (search.rs:67-77: `score as f32` off the u64 collector)
            out = []
            for d, _ in items:
                v = self.docs[d].get(sort_by)
                out.append((d, float(v.timestamp()) if hasattr(v, "timestamp")
                            else float(v)))
            return out
        items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return items[:k]
