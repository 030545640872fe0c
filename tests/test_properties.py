"""Property-based & model-based tests.

- hypothesis over the pure-Python pieces (philter, span anchoring) —
  cheap per-example, so full example counts;
- a seeded random-operations model test for the merge sink: every merge
  semantics decision is replayed against a dict-based reference model
  (the structure of the reference's Delta behavior suite, SURVEY §5.5,
  generalized from hand-picked to generated cases).
"""

from __future__ import annotations

import random
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from cumulus_etl_spark.deid.philter import scrub_text
from cumulus_etl_spark.nlp.span import anchor_span
from cumulus_etl_spark.sinks import ManagedTable, MergePolicy

# ---- philter properties ----

text_strategy = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cc", "Cs")),
    max_size=200,
)


@given(text_strategy)
def test_philter_length_preserving(text):
    out = scrub_text(text)
    assert len(out) == len(text)


@given(text_strategy)
def test_philter_idempotent(text):
    once = scrub_text(text)
    assert scrub_text(once) == once


@given(st.emails())
def test_philter_kills_emails(email):
    out = scrub_text(f"contact: {email} asap")
    assert email not in out


@given(st.from_regex(r"\d{3}-\d{2}-\d{4}", fullmatch=True))
def test_philter_kills_ssns(ssn):
    assert ssn not in scrub_text(f"ssn is {ssn}.")


@given(
    st.sampled_from(sorted(__import__("cumulus_etl_spark.deid.names", fromlist=["FIRST_NAMES"]).FIRST_NAMES)),
    st.from_regex(r"[A-Z][a-z]{1,10}", fullmatch=True),
)
def test_philter_kills_known_first_plus_capitalized_last(first, last):
    """Any known first name followed by any capitalized surname-shaped
    token is a name pair — must vanish on the length-preserving path."""
    text = f"discussed with {first} {last} today"
    out = scrub_text(text)
    assert f"{first} {last}" not in out
    assert len(out) == len(text)


@given(
    st.from_regex(r"[A-Z][a-z]{1,10}", fullmatch=True),
    st.sampled_from(sorted(__import__("cumulus_etl_spark.deid.names", fromlist=["SURNAMES"]).SURNAMES)),
)
def test_philter_kills_capitalized_first_plus_known_surname(first, last):
    text = f"per {first} {last} at triage"
    out = scrub_text(text)
    assert f"{first} {last}" not in out


# ---- span anchoring properties ----

word = st.from_regex(r"[A-Za-z]{1,8}", fullmatch=True)


@given(st.lists(word, min_size=3, max_size=15), st.data())
def test_anchor_finds_real_substrings(words, data):
    note = " ".join(words)
    i = data.draw(st.integers(0, len(words) - 1))
    j = data.draw(st.integers(i, min(i + 3, len(words) - 1)))
    target = " ".join(words[i : j + 1])
    span = anchor_span(note, target)
    assert span is not None
    begin, end = span
    # the anchored window fuzzy-matches the target (case/punct tolerant)
    anchored_tokens = [t.lower() for t in re.findall(r"\w+", note[begin:end])]
    target_tokens = [t.lower() for t in re.findall(r"\w+", target)]
    assert anchored_tokens == target_tokens


@settings(max_examples=30)
@given(word, st.lists(word, min_size=1, max_size=6))
def test_anchor_none_when_absent(needle, words):
    note = " ".join(w for w in words if w.lower() != needle.lower())
    span = anchor_span(note, needle)
    if span is not None:
        b, e = span
        assert re.findall(r"\w+", note[b:e].lower()) == [needle.lower()]


# ---- merge sink model test ----


def _model_merge(model: dict, batch: list[tuple], policy: MergePolicy) -> None:
    """Reference semantics in plain Python dicts (id → (val, ts))."""
    # in-batch dedup: freshest ts wins
    best: dict[str, tuple] = {}
    for rid, val, ts in batch:
        if rid not in best or (ts or "") >= (best[rid][1] or ""):
            if rid in best and ts is not None and best[rid][1] is not None and ts < best[rid][1]:
                continue
            best[rid] = (val, ts)
    for rid, (val, ts) in best.items():
        if rid not in model:
            model[rid] = (val, ts)
        elif policy.update_existing:
            old_ts = model[rid][1]
            if ts is None or old_ts is None or ts >= old_ts:
                model[rid] = (val, ts)


def test_merge_random_ops_match_model(spark, tmp_path):
    rng = random.Random(1234)
    ids = [f"id{i}" for i in range(8)]
    dates = [None] + [f"2021-0{m}-01T00:00:00Z" for m in range(1, 8)]
    policy = MergePolicy()
    tbl = ManagedTable(spark, str(tmp_path), "model_test")
    model: dict[str, tuple] = {}

    for step in range(6):
        batch = [
            (rng.choice(ids), f"v{step}-{k}", rng.choice(dates))
            for k in range(rng.randint(1, 6))
        ]
        # same (id, ts) with different payloads has no defined winner in a
        # distributed batch (no file order) — don't generate those; the
        # deterministic-tiebreak behavior is separately covered below
        seen_key = {}
        batch = [b for b in batch if seen_key.setdefault((b[0], b[2]), b[1]) == b[1]]
        df = spark.createDataFrame(
            [(rid, val, {"lastUpdated": ts}) for rid, val, ts in batch],
            "id string, val string, meta struct<lastUpdated: string>",
        )
        tbl.merge(df, policy)
        _model_merge(model, batch, policy)

        got = {
            r["id"]: (r["val"], r["meta"]["lastUpdated"] if r["meta"] else None)
            for r in tbl.read().collect()
        }
        assert got == model, f"divergence at step {step}"


def test_merge_equal_ts_duplicate_is_deterministic(spark, tmp_path):
    """Same (id, ts), different payloads: winner is arbitrary but MUST be
    the same on every run (content-hash tiebreak)."""
    winners = set()
    for attempt in range(3):
        tbl = ManagedTable(spark, str(tmp_path), f"tie_{attempt}")
        df = spark.createDataFrame(
            [("a", "x", {"lastUpdated": "2021-01-01T00:00:00Z"}),
             ("a", "y", {"lastUpdated": "2021-01-01T00:00:00Z"})],
            "id string, val string, meta struct<lastUpdated: string>",
        ).repartition(4)
        tbl.merge(df, MergePolicy())
        winners.add(tbl.read().collect()[0]["val"])
    assert len(winners) == 1


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000_000),
    st.integers(min_value=1, max_value=97),
)
def test_hash_split_bucket_arithmetic_is_stable(doc_id, train_pct):
    """The split bucket is pure arithmetic on the id — recompute it in
    Python and it must agree with what the Spark expression computes
    (same formula, both exact integer ops)."""
    bucket = (doc_id * 2654435761) % (2**32) % 100
    expected = (
        "train" if bucket < train_pct else ("val" if bucket == train_pct else "test")
    )
    # mirror of operators/corpus.py:hash_split with val_pct=1
    got = (
        "train" if bucket < train_pct
        else "val" if bucket < train_pct + 1
        else "test"
    )
    assert got == expected


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=2, max_value=64),
    st.data(),
)
def test_chunk_overlap_window_math_covers_every_word(n_words, size, data):
    """Pure window arithmetic invariants (mirrors operators/corpus.py:
    chunk_overlap): with stride <= size — the operator's coverage
    precondition — every word index falls in >=1 window, window sizes
    are bounded by `size`, and consecutive full windows overlap by
    exactly size - stride."""
    stride = data.draw(st.integers(min_value=1, max_value=size))
    starts = list(range(0, n_words, stride))
    assert len(starts) == -(-n_words // stride)  # ceil: one window per stride step
    covered = set()
    for s in starts:
        end = min(s + size, n_words)
        assert 0 < end - s <= size
        covered.update(range(s, end))
    assert covered == set(range(n_words))
    # consecutive full windows share exactly max(0, size - stride) words
    for s1, s2 in zip(starts, starts[1:]):
        if s1 + size <= n_words:
            assert min(s1 + size, n_words) - s2 == max(0, size - stride) or s2 + size > n_words


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_parse_avi_never_crashes_on_arbitrary_bytes(payload):
    """The AVI demux is total: arbitrary bytes either parse to a
    well-formed info dict (frames inside the payload) or return None —
    never an exception (a mixed 100-TB corpus WILL contain garbage)."""
    from cumulus_etl_spark.operators.multimodal import parse_avi

    info = parse_avi(payload)
    if info is not None:
        for off, sz in info["frames"]:
            assert 0 <= off <= len(payload) and sz >= 0


@given(st.binary(min_size=12, max_size=400))
@settings(max_examples=200, deadline=None)
def test_parse_avi_never_crashes_on_riff_prefixed_bytes(payload):
    """Same totality with an adversarial valid magic prefix."""
    import struct

    from cumulus_etl_spark.operators.multimodal import parse_avi

    forged = b"RIFF" + struct.pack("<I", len(payload)) + b"AVI " + payload
    info = parse_avi(forged)
    if info is not None:
        for off, sz in info["frames"]:
            assert 0 <= off <= len(forged) and sz >= 0


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300))
@settings(max_examples=200, deadline=None)
def test_convert_bsv_text_is_total_and_4_column(text):
    """BSV conversion never crashes and only ever emits 4-column rows."""
    from cumulus_etl_spark.nlp.ctakes_dict import convert_bsv_text

    out = convert_bsv_text(text)
    for line in out.splitlines():
        assert len(line.split("|")) == 4
