"""Deterministic synthetic transcript corpus — the graft input shape.

Columns (BASELINE.json:15): (conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp).  Generation rules follow
FIXTURES.md §B: seed 42, Zipf(s=1.1) over a 50k pseudo-word vocabulary,
plus marker words at controlled frequencies so the reference query set
(Q1–Q15) has known selectivity and exercises stemming, phrase adjacency,
skew, the 40-byte token filter and Unicode handling.

Everything is a pure function of (seed, n_turns) — no wall clock, no
external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 50_000
_SYLLABLES = ["ba", "ko", "ri", "ta", "zu", "me", "lo", "pi", "sa", "ven",
              "dor", "ki", "nu", "fe", "gra"]

LONG_TOKEN = "tokenizationpipelineextremelylongwordoverfortybytesx"
UNICODE_TOKEN = "Ünïcödé"

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.40, 0.40, 0.05, 0.15])
TOOLS = np.array(["search", "browser", "python", "bash", "editor"])


def _vocab() -> list[str]:
    out = []
    n_syl = len(_SYLLABLES)
    for k in range(VOCAB_SIZE):
        parts, v = [], k
        for _ in range(3):
            parts.append(_SYLLABLES[v % n_syl])
            v //= n_syl
        out.append("w" + "".join(parts) + str(k % 97))
    return out


def generate_transcripts(n_turns: int, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())

    # conversations: draw turns_per_conv in [2, 12] until n_turns covered
    sizes = []
    total = 0
    while total < n_turns:
        s = int(rng.integers(2, 13))
        s = min(s, n_turns - total)
        sizes.append(s)
        total += s
    n_convs = len(sizes)
    conv_seq = np.repeat(np.arange(n_convs), sizes)
    conv_id = np.array([f"conv-{i:08d}" for i in range(n_convs)])[conv_seq]
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)

    role = rng.choice(ROLES, size=n_turns, p=ROLE_P)
    tool = np.where(role == "tool", rng.choice(TOOLS, size=n_turns), None)

    # base text: 5–120 Zipf tokens
    lengths = rng.integers(5, 121, size=n_turns)
    # Zipf(s=1.1) over the fixed vocabulary via normalized power-law weights
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    flat = rng.choice(VOCAB_SIZE, size=int(lengths.sum()), p=probs)
    words = vocab[flat]
    bounds = np.concatenate([[0], np.cumsum(lengths)])

    # marker draws (FIXTURES.md §B)
    u = rng.random((n_turns, 8))
    has_hello_world = u[:, 0] < 0.001
    has_hello_alone = (~has_hello_world) & (u[:, 1] < 0.005)
    mundo_turns = np.zeros(n_turns, dtype=bool)
    mundo_turns[::10_000] = True  # exactly once per 10k turns
    stem_rot = np.array(["stemming", "stemmed", "stems"])
    has_stem = u[:, 2] < 0.002
    stem_word = stem_rot[(np.arange(n_turns)) % 3]
    has_the = u[:, 3] < 0.40
    has_long = u[:, 4] < 0.0005
    has_unicode = u[:, 5] < 0.0005
    has_needle = (role == "tool") & (u[:, 6] < 0.10)  # 0.1% overall ≈ 10% of tool turns? keep deterministic rate on tool turns
    insert_pos = (u[:, 7] * np.maximum(lengths - 1, 1)).astype(int)

    # trending term (corpus v2): "trendalpha" BURSTS (tf 3-8) inside one
    # conversation-time band ([30%, 35%) of convs) and appears tf=1 at a
    # trickle everywhere else — the realistic 100 TB shape where a term
    # spikes in a time slice.  Because segments are built in
    # (conv_id, turn_idx) order, the burst lands in few segments, giving
    # block-max WAND per-segment bounds something to discriminate on
    # (cold segments bound at max_tf=1 and fall below the probe's θ).
    # Drawn AFTER every pre-v2 rng draw so the rest of the corpus is
    # bit-identical to v1.
    u_trend = rng.random(n_turns)
    conv_frac = conv_seq / max(n_convs, 1)
    in_band = (conv_frac >= 0.30) & (conv_frac < 0.35)
    trend_burst = in_band & (u_trend < 0.02)
    trend_bg = (~in_band) & (u_trend < 0.0005)
    trend_tf = 3 + (np.arange(n_turns) % 6)  # burst tf in [3, 8]

    texts = []
    for i in range(n_turns):
        toks = list(words[bounds[i]:bounds[i + 1]])
        p = min(insert_pos[i], len(toks))
        extra = []
        if has_hello_world[i]:
            extra += ["hello", "world"]
        elif has_hello_alone[i]:
            extra += ["hello"]
        if mundo_turns[i]:
            extra += ["mundo"]
        if has_stem[i]:
            extra += [stem_word[i]]
        if has_the[i]:
            extra += ["the"]
        if has_long[i]:
            extra += [LONG_TOKEN]
        if has_unicode[i]:
            extra += [UNICODE_TOKEN]
        if has_needle[i]:
            extra += ["needle"]
        if trend_burst[i]:
            extra += ["trendalpha"] * int(trend_tf[i])
        elif trend_bg[i]:
            extra += ["trendalpha"]
        toks[p:p] = extra
        texts.append(" ".join(toks))

    ts = (
        np.datetime64("2026-01-01T00:00:00")
        + conv_seq.astype("timedelta64[h]")
        + (turn_idx * 7).astype("timedelta64[s]")
    )

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


TRANSCRIPT_SCHEMA = [
    {"name": "text", "type": "text",
     "options": {"indexing": {"record": "position", "tokenizer": "en_stem"},
                 "stored": True}},
    {"name": "role", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
    {"name": "tool", "type": "text",
     "options": {"indexing": {"record": "basic", "tokenizer": "raw"},
                 "stored": True}},
    {"name": "ts", "type": "date", "options": {"fast": True, "stored": True}},
    {"name": "conv_id", "type": "text", "options": {"indexing": None, "stored": True}},
    {"name": "turn_idx", "type": "i64", "options": {"stored": True}},
]
