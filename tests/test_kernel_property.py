"""Property-based checks of the pure per-batch kernels (no Ray session):
the sliding-window count against an O(n²) brute force, redaction
idempotence, and the heavy-hitter candidate pass's pigeonhole guarantee
under arbitrary corpus → batch partitions."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import rolling_counts
from fluent_plugin_kubernetes_metadata_filter_ray.stages.redact import scrub_table
from fluent_plugin_kubernetes_metadata_filter_ray.functions.textstats import (
    HH_FRAC,
    _HH_TOTAL,
    _hh_candidate_partial,
)


@settings(max_examples=200, deadline=None)
@given(
    ts=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    win=st.integers(0, 60),
)
def test_rolling_counts_matches_bruteforce(ts, win):
    a = np.array(ts, dtype=np.int64)
    got = rolling_counts(a, win)
    for i, t in enumerate(ts):
        expect = sum(1 for u in ts if t - win <= u <= t)
        assert got[i] == expect


_noise = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
_pii = st.sampled_from(
    [
        "bob@ex.io",
        "10.1.2.3",
        "Bearer tok-1",
        "ab" * 16,
        "deadbeef" * 8,
        "x@y.zz 1.2.3.4",
    ]
)
_texts = st.lists(
    st.one_of(st.none(), st.tuples(_noise, _pii, _noise).map(lambda t: t[0] + t[1] + t[2]), _noise),
    min_size=1,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(texts=_texts)
def test_scrub_idempotent_on_text(texts):
    t = pa.table({"text": pa.array(texts, pa.string())})
    once = scrub_table(t, columns=("text",))
    twice = scrub_table(
        pa.table({"text": once.column("text")}), columns=("text",)
    )
    assert once.column("text").to_pylist() == twice.column("text").to_pylist()
    # second pass finds nothing left to mask
    assert all(n == 0 for n in twice.column("n_redacted").to_pylist())
    # nulls stay null
    for before, after in zip(texts, once.column("text").to_pylist()):
        assert (before is None) == (after is None)


_token = st.sampled_from([f"t{i}" for i in range(12)])
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=150, deadline=None)
@given(
    docs=st.lists(_doc, min_size=1, max_size=24),
    n_batches=st.integers(1, 5),
)
def test_heavy_hitter_candidates_cover_global(docs, n_batches):
    """Pigeonhole: the union of per-batch locally-heavy candidates must
    contain every token with global frequency ≥ HH_FRAC·N, for ANY
    partition of the corpus into batches."""
    all_tokens = [w for d in docs for w in d.split()]
    n_total = len(all_tokens)
    from collections import Counter

    counts = Counter(all_tokens)
    heavy = {t for t, c in counts.items() if n_total and c >= HH_FRAC * n_total}

    cands = set()
    seen_total = 0
    for chunk in np.array_split(np.array(docs, dtype=object), n_batches):
        batch = pa.table(
            {
                "doc_id": pa.array(range(len(chunk)), pa.int64()),
                "text": pa.array(list(chunk), pa.string()),
            }
        )
        part = _hh_candidate_partial(batch)
        for tok, n in zip(
            part.column("token").to_pylist(), part.column("n").to_pylist()
        ):
            if tok == _HH_TOTAL:
                seen_total += n
            else:
                cands.add(tok)
    assert seen_total == n_total
    assert heavy <= cands


from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
    _HOP_US,
    N_HOPS,
    template_column,
)


@settings(max_examples=150, deadline=None)
@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(min_size=0, max_size=60)),
        min_size=1,
        max_size=8,
    )
)
def test_template_mask_idempotent_and_digit_free(texts):
    col = pa.chunked_array([pa.array(texts, pa.string())])
    once = template_column(col)
    twice = template_column(once)
    assert once.equals(twice)  # masking is a fixed point
    for v in once.to_pylist():
        if v is not None:
            # every ASCII digit run is masked ([0-9] is ASCII-only in RE2
            # on BOTH sides — unicode digits like '²' pass through by
            # design); <num>/<hex> carry no digits
            assert not any(c in "0123456789" for c in v)


@settings(max_examples=150, deadline=None)
@given(
    ts=st.lists(st.integers(0, 10**7), min_size=0, max_size=30),
    n_splits=st.integers(1, 4),
    data=st.data(),
)
def test_hopping_partial_partition_independent(ts, n_splits, data):
    """The hopping combiner gives the same global window counts under ANY
    batch partition of the input — summing partials is exact — and each
    turn lands in exactly N_HOPS windows."""
    from collections import Counter

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        _hopping_partial,
    )

    # expected: brute force over each turn's N_HOPS windows
    expect = Counter()
    for t in ts:
        b = (t // _HOP_US) * _HOP_US
        for s in range(N_HOPS):
            expect[b - s * _HOP_US] += 1

    # split into arbitrary contiguous batches, apply the REAL combiner per
    # batch, and sum the partials
    cuts = sorted(
        data.draw(st.lists(st.integers(0, len(ts)), min_size=n_splits - 1,
                           max_size=n_splits - 1))
    )
    got = Counter()
    bounds = [0] + cuts + [len(ts)]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        batch = pa.table(
            {"ts": pa.array(ts[lo:hi], pa.int64()).cast(pa.timestamp("us"))}
        )
        part = _hopping_partial(batch)
        for w, n in zip(part.column("w_us").to_pylist(),
                        part.column("n_turns").to_pylist()):
            got[w] += n
    assert got == expect
    assert sum(got.values()) == N_HOPS * len(ts)


from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
    _hll_partial,
)


@settings(max_examples=60, deadline=None)
@given(
    ids=st.lists(st.integers(0, 4000), min_size=0, max_size=120),
    n_splits=st.integers(1, 4),
    data=st.data(),
)
def test_hll_registers_partition_independent(ids, n_splits, data):
    """Register tables merge with max(): building them per-batch over ANY
    split of the input and max-merging equals building them in one pass —
    the property that makes the sketch a valid distributed combiner."""
    convs = [f"conv-{i}" for i in ids]
    whole = _hll_partial(pa.table({"conv_id": pa.array(convs, pa.string())}))
    expect = dict(zip(whole.column("bucket").to_pylist(), whole.column("rho").to_pylist()))

    cuts = sorted(
        data.draw(st.lists(st.integers(0, len(convs)), min_size=n_splits - 1,
                           max_size=n_splits - 1))
    )
    got: dict = {}
    bounds = [0] + cuts + [len(convs)]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        part = _hll_partial(pa.table({"conv_id": pa.array(convs[lo:hi], pa.string())}))
        for b, r in zip(part.column("bucket").to_pylist(), part.column("rho").to_pylist()):
            got[b] = max(got.get(b, 0), r)
    assert got == expect


def test_hll_estimate_accuracy():
    """End-of-formula sanity without Ray: 30k distinct ids estimated within
    the sketch's expected error band (1.04/sqrt(4096) ≈ 1.6%; assert 6%)."""
    import math

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        HLL_M,
        _HLL_MAX_RHO,
        _HLL_SCALE,
    )

    n = 30_000
    part = _hll_partial(
        pa.table({"conv_id": pa.array([f"conv-{i}" for i in range(n)], pa.string())})
    )
    rhos = part.column("rho").to_pylist()
    v_zero = HLL_M - len(rhos)
    z = sum(1 << (_HLL_MAX_RHO - r) for r in rhos) + (v_zero << _HLL_MAX_RHO)
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    raw = alpha * float(HLL_M) * float(HLL_M) * _HLL_SCALE / float(z)
    est = (
        float(HLL_M) * math.log(float(HLL_M) / v_zero)
        if raw <= 2.5 * HLL_M and v_zero > 0
        else raw
    )
    assert abs(est - n) / n < 0.06


@settings(max_examples=150, deadline=None)
@given(
    ts=st.lists(st.integers(0, 30), min_size=1, max_size=25),
    late=st.integers(0, 20),
)
def test_watermark_delay_matches_bruteforce(ts, late):
    """The sorted-block lateness kernel vs an O(n²) brute force on one
    conversation: delay_us[i] = max(0, max(ts[:i]) - ts[i]) in sequence
    order (ties on (turn_idx, ts) can't affect a running max of ts)."""
    import pyarrow as pa

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
        _late_sorted_block,
    )

    n = len(ts)
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "ts": pa.array([v * 1_000_000 for v in ts], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    out = _late_sorted_block(t)
    got = dict(zip(out.column("turn_idx").to_pylist(), out.column("delay_us").to_pylist()))
    for i, v in enumerate(ts):
        expect = max(0, max(ts[:i], default=v) - v) * 1_000_000
        assert got[i] == expect


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_image_header_parsers_reject_truncation(data):
    """Any PREFIX of a valid PNG/JPEG/GIF container either parses to the
    full dims or returns None — truncation can never crash or mis-parse."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import multimodal as mm

    w = data.draw(st.integers(1, 64))
    h = data.draw(st.integers(1, 64))
    fmts = {
        "png": (mm.png_payload, mm.parse_png_header),
        "jpeg": (mm.jpeg_payload, mm.parse_jpeg_header),
        "gif": (mm.gif_payload, mm.parse_gif_header),
    }
    fmt = data.draw(st.sampled_from(sorted(fmts)))
    make, parse = fmts[fmt]
    b = make(w, h)
    cut = data.draw(st.integers(0, len(b)))
    got = parse(b[:cut])
    assert got in (None, (w, h, 3))
    assert parse(b) == (w, h, 3)  # the untruncated container always parses
    # cross-parser rejection: each container parses as exactly one format
    for other_fmt, (_, other_parse) in fmts.items():
        if other_fmt != fmt:
            assert other_parse(b) is None


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_wav_header_parser_truncation_and_fuzz(data):
    """Any PREFIX of a valid WAV either parses to the full params or
    returns None; random bytes never crash; the image parsers reject WAV
    containers and vice versa."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import multimodal as mm

    sr = data.draw(st.sampled_from(mm.WAV_RATES))
    ch = data.draw(st.integers(1, 2))
    ns = data.draw(st.integers(0, 512))
    b = mm.wav_payload(sr, ch, ns)
    assert mm.parse_wav_header(b) == (sr, ch, 16, ns)
    cut = data.draw(st.integers(0, len(b)))
    got = mm.parse_wav_header(b[:cut])
    # a prefix may lose the data chunk tail: n_samples can only shrink
    assert got is None or (got[0], got[1], got[2]) == (sr, ch, 16) and got[3] <= ns
    # cross-format rejection
    assert mm.parse_png_header(b) is None
    assert mm.parse_jpeg_header(b) is None
    assert mm.parse_gif_header(b) is None
    assert mm.parse_wav_header(mm.png_payload(4, 4)) is None
    # arbitrary garbage never crashes
    junk = data.draw(st.binary(max_size=64))
    mm.parse_wav_header(junk)


@settings(max_examples=150, deadline=None)
@given(
    sets_=st.lists(
        st.frozensets(st.integers(0, 30), min_size=1, max_size=12),
        min_size=1, max_size=20,
    ),
)
def test_ngram_bucket_counting_verify_matches_bruteforce(sets_):
    """The collision-counting verify (concat-sort-bincount into a g×g
    intersection matrix) must equal per-pair set intersection exactly —
    for every bucket layout, including duplicate member sets and the
    integer threshold boundary 8*inter == 3*(sza+szb)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.dedup import (
        _ngram_bucket_verify_sorted_block,
    )

    # one bucket (equal h) holding every member, ids = position
    packed = [
        np.sort(np.array(sorted(s), dtype=np.int64)).tobytes() for s in sets_
    ]
    batch = pa.table(
        {
            "h": pa.array([7] * len(sets_), pa.int64()),
            "doc_id": pa.array(range(len(sets_)), pa.int64()),
            "s63": pa.array(packed, pa.binary()),
        }
    )
    got = _ngram_bucket_verify_sorted_block(batch)
    got_pairs = {
        (a, b): j
        for a, b, j in zip(
            got.column("doc_a").to_pylist(),
            got.column("doc_b").to_pylist(),
            got.column("jaccard").to_pylist(),
        )
    }
    expect = {}
    for i in range(len(sets_)):
        for j in range(i + 1, len(sets_)):
            inter = len(sets_[i] & sets_[j])
            union = len(sets_[i] | sets_[j])
            jac = inter / union
            if 8 * inter >= 3 * (len(sets_[i]) + len(sets_[j])):
                expect[(i, j)] = jac
    assert got_pairs == expect


@settings(max_examples=60, deadline=None)
@given(
    run_lens=st.lists(st.integers(2, 9), min_size=0, max_size=12),
    gaps=st.lists(st.integers(0, 3), min_size=12, max_size=12),
)
def test_expand_run_pairs_matches_bruteforce(run_lens, gaps):
    from fluent_plugin_kubernetes_metadata_filter_ray.functions.dedup import (
        _expand_run_pairs,
    )

    starts, pos = [], 0
    for k, gap in zip(run_lens, gaps):
        pos += gap
        starts.append(pos)
        pos += k
    rs = np.array(starts, dtype=np.int64)
    rl = np.array(run_lens, dtype=np.int64)
    a, b = _expand_run_pairs(rs, rl)
    expect = [
        (x, y)
        for s, k in zip(starts, run_lens)
        for x in range(s, s + k)
        for y in range(x + 1, s + k)
    ]
    assert list(zip(a.tolist(), b.tolist())) == expect
