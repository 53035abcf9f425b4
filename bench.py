"""Benchmark harness — prints ONE JSON line for the driver.

Headline: end-to-end parse → enrich → route throughput (turns/sec) over the
derived transcripts table at $GRAFT_SF_DIR (default sf0.1), replicated
KMETA_BENCH_REP× (default 10 → ~1M turns) to give the streaming executor
real work.  ``--scaling`` runs the identical compute-mode job in fresh processes at
two CPU counts (KMETA_SCALING_CPUS, default 2,8 — the pair that isolates
engine scaling from the documented single-node walls) and reports both
throughputs + scaling efficiency (the sandbox stand-in for the N vs 4N
node criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _shuffle_bytes(stats: str) -> int:
    """Bytes entering every all-to-all exchange of an executed Dataset,
    parsed from ``ds.stats()``: the 'Output size bytes … total' of the
    shuffle-INPUT suboperators (SortMap / AggregateMap / RepartitionSplit /
    Join…_shuffle).  Recorded per _big entry so the shuffle-payload claims
    in BASELINE.md are tracked numbers, not one-off measurements."""
    import re

    total, counting = 0, False
    for line in stats.splitlines():
        m = re.match(r"\s*Suboperator \d+ (\S+)", line)
        if m:
            counting = bool(
                re.search(r"SortMap|AggregateMap|RepartitionSplit|_shuffle", m.group(1))
            )
            continue
        if re.match(r"\s*Operator \d+ ", line):
            counting = False
            continue
        if counting:
            b = re.match(r"\s*\* Output size bytes per block: .*?(\d+) total", line)
            if b:
                total += int(b.group(1))
    return total
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# default 25 → ~2.5M turns at sf0.1: large enough that fixed costs (init +
# actor-pool spawn ≈ 6 s) stop dominating the measured throughput
REP = int(os.environ.get("KMETA_BENCH_REP", "25"))


def run_bench() -> dict:
    import ray

    # BEFORE ray.init: worker processes inherit the env from the node they
    # fork from — setting this after init never reaches them (verified)
    os.environ.setdefault("KMETA_QUIET_CLIPS", "1")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.pipelines import flagship
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import route_counts

    # warm: derive+cache transcripts and the metadata snapshot; prime OS page
    # cache so we measure compute, not first-touch disk reads
    tpath = dg.transcripts_path(SF_DIR, rep=REP)
    dg.metadata_snapshot_dir()
    for name in os.listdir(tpath):
        with open(os.path.join(tpath, name), "rb") as f:
            while f.read(1 << 24):
                pass
    # spin up the Ray worker pool so the timed run doesn't pay process-fork +
    # import latency: a mini run of the SAME pipeline shape pre-imports
    # pandas/pyarrow in enough worker processes for the real actor pool to
    # reuse them (30 fresh actor processes otherwise burn ~60 s of CPU on
    # imports, racing the measured job — the source of bimodal timings)
    flagship.run_flagship("/root/testdata/sf0.001", out_dir=None, rep=1).to_pandas()
    # Warm the worker pool for the function queries too: this host's
    # FIRST-touch page faults run ~45 MB/s in fresh processes (measured:
    # an identical numpy kernel is 60× slower on its first call than its
    # second — hypervisor memory ballooning), so a mini same-shape run at
    # sf0.001 lets the measured runs hit pre-touched worker heaps.
    if os.environ.get("KMETA_BENCH_ONLY", "full") == "full":
        from fluent_plugin_kubernetes_metadata_filter_ray.functions import registry as _reg

        _fq = _reg.queries()
        for _name in ("q_dedup_minhash", "q_ann_lsh", "q_embed_neardup_lsh"):
            _fq[_name]("/root/testdata/sf0.001").count()

    queries: dict[str, float] = {}
    trials_out: dict[str, list] = {}
    shuffle_bytes: dict[str, int] = {}
    mode = os.environ.get("KMETA_BENCH_ONLY", "full")  # full | e2e | compute
    e2e_only = mode in ("e2e", "compute")
    n_rows = None

    # VERDICT r3 task 8: this host's hypervisor steal makes single walls
    # swing up to 7× — every light entry runs KMETA_BENCH_TRIALS times and
    # reports the MEDIAN (raw walls kept in "trials" so entry-level
    # regressions are self-explaining); heavy entries (>15 s) run once.
    n_trials = int(os.environ.get("KMETA_BENCH_TRIALS", "3"))

    def timed(name: str, fn, trials: int = 0, shuffle: bool = False, pre=None):
        walls = []
        for i in range(trials or n_trials):
            if pre is not None:
                pre()  # per-trial setup (e.g. clearing the prior sink) stays
                # OUTSIDE the measured wall — rmtree of a 600 MB dirty sink
                # costs >1 s of writeback otherwise
            t0 = time.perf_counter()
            r = fn()
            walls.append(time.perf_counter() - t0)
            if shuffle and i == 0:
                shuffle_bytes[name] = _shuffle_bytes(r.stats())
            del r
        walls.sort()
        trials_out[name] = [round(w, 3) for w in walls]
        # lower median: hypervisor-steal noise is strictly one-sided (it only
        # ADDS wall time), so for even n the lower middle is the better
        # capability estimate
        queries[name] = walls[(len(walls) - 1) // 2]

    if mode == "compute":
        # scaling-evidence job: parse → enrich → per-sink counts, NO sink
        # write.  On one box the 13 GB/40 M-row sink write is bound by the
        # single local disk (a resource that does NOT scale with num_cpus —
        # on a real N vs 4N node cluster it scales with nodes), so CPU
        # scaling is evidenced on the compute pipeline.
        t0 = time.perf_counter()
        counts = flagship.run_flagship(SF_DIR, out_dir=None, rep=REP).to_pandas()
        headline = time.perf_counter() - t0
        n_rows = int(counts["n_turns"].sum())
        ray.shutdown()
        return {
            "metric": "parse→enrich→aggregate (no sink write)",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {"compute": round(headline, 3)},
            "sf": SF_DIR,
            "rep": REP,
            "rows": n_rows,
            "turns_per_sec": round(n_rows / headline, 1),
            "num_cpus": NUM_CPUS,
        }

    if not e2e_only:
        # q1: parse-only throughput (count consumes the stream distributed)
        from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

        n_rows = parse_stage(
            flagship.read_transcripts(SF_DIR, rep=REP), DEFAULT_CONFIG
        ).count()  # row count once, untimed
        timed("parse_only", lambda: parse_stage(
            flagship.read_transcripts(SF_DIR, rep=REP), DEFAULT_CONFIG).count())

        # q2: parse+enrich
        timed("parse_enrich", lambda: flagship.build_enriched(SF_DIR, rep=REP).count())

        # record scrubbing over the replicated transcripts (RE2 mask pass)
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.redact import (
            redact_stage,
        )

        timed("redact_only",
              lambda: redact_stage(flagship.read_transcripts(SF_DIR, rep=REP)).count())

        # windowed sessionization over the replicated transcripts
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
            conv_sessions,
        )

        timed("conv_sessions",
              lambda: conv_sessions(flagship.read_transcripts(SF_DIR, rep=REP)).count())

        # template mining over the replicated transcripts (full-corpus RE2
        # mask + the exact-distinct-conv double shuffle)
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
            log_templates,
        )

        timed("log_templates",
              lambda: log_templates(flagship.read_transcripts(SF_DIR, rep=REP)).count())

        # conv-window family at ≥100k conversations (VERDICT r2 task 1):
        # salt conv_id by turn_idx so the 1,500-user corpus becomes
        # 1500×128 ≈ 192k conversations of ~13 turns — the group-count
        # regime where map_groups paid ~75 µs of Python PER GROUP (~14 s
        # of pure overhead here); the sorted-block kernels pay only the
        # conv_id sort + vectorized scans.
        import pyarrow as _pa
        import pyarrow.compute as _pc

        def _salt_convs(t):
            salt = _pc.cast(
                _pc.bit_wise_and(_pc.cast(t.column("turn_idx"), _pa.int32()), 127),
                _pa.string(),
            )
            conv = _pc.binary_join_element_wise(
                _pc.fill_null(t.column("conv_id"), "null"), salt, "-"
            )
            return t.set_column(t.column_names.index("conv_id"), "conv_id", conv)

        def _salted(rep=REP):
            return flagship.read_transcripts(SF_DIR, rep=rep).map_batches(
                _salt_convs, batch_format="pyarrow", zero_copy_batch=True
            )

        from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
            conv_concat,
            turn_rolling,
            turn_session_assign,
        )
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
            role_transitions,
        )

        for name, op in (
            ("conv_sessions_big", conv_sessions),
            ("turn_rolling_big", turn_rolling),
            ("conv_concat_big", conv_concat),
            ("role_transitions_big", role_transitions),
            ("turn_session_assign_big", turn_session_assign),
        ):
            timed(name, lambda op=op: op(_salted()).count())

        # training-data ops over the sf documents/embeddings tables
        from fluent_plugin_kubernetes_metadata_filter_ray.functions import registry

        fq = registry.queries()
        for name in ("q_dedup_exact", "q_dedup_minhash", "q_ann_topk",
                     "q_ann_lsh", "q_embed_neardup_lsh"):
            timed(name[2:], lambda name=name: fq[name](SF_DIR).count())

        # BIG derived corpus (replicated + permuted/rotated — scalegen.py):
        # the sf tables top out at 5k docs / 2k vectors, where these ops
        # mostly measure stage-setup latency; the big entries measure real
        # throughput at ~180k (augmented) docs / 128k vectors.  Clip logs
        # silenced (counters still bump); pair counts stay linear in rep
        # by construction.
        from fluent_plugin_kubernetes_metadata_filter_ray.functions import scalegen

        big_docs = int(os.environ.get("KMETA_BENCH_BIGDOCS", "20"))
        big_vecs = int(os.environ.get("KMETA_BENCH_BIGVECS", "64"))
        big = scalegen.big_sf_dir(SF_DIR, big_docs, big_vecs)
        # heavy entries (>15 s single wall) get best-of-2 (lower median of
        # two) instead of the full trial count — steal spikes of 2× have
        # been observed on singles (dedup_minhash_big 47 s vs 23-26 s)
        heavy = {"q_dedup_minhash", "q_dedup_incremental_fuzzy", "q_dedup_ngram"}
        for name in ("q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram",
                     "q_dedup_incremental_fuzzy",
                     "q_ann_lsh", "q_ann_ivf", "q_embed_neardup_lsh", "q_doc_chunks"):
            timed(name[2:] + "_big",
                  lambda name=name: fq[name](big).materialize(),
                  trials=2 if name in heavy else 0, shuffle=True)

        # persisted-state incremental fuzzy dedup (VERDICT r4 task 1): the
        # prior-crawl LSH checkpoint is written ONCE (untimed — it is the
        # previous crawl's output at steady state); the timed entry is the
        # recurring crawl-N+1 pass, which shingles only the new split and
        # reads the history's band/set rows from parquet.
        from fluent_plugin_kubernetes_metadata_filter_ray.functions import (
            dedup as _dd,
        )

        _dd.fuzzy_state_write(big, _dd.default_fuzzy_state_dir(big))
        timed("dedup_incremental_fuzzy_resume_big",
              lambda: _dd.q_dedup_incremental_fuzzy_resume(big).materialize(),
              trials=2, shuffle=True)
        # exact-join twin of the same recurring-ingestion contract: the
        # checkpoint is the thin (doc_id, h) instance table; crawl N+1
        # shingles only the new split
        _dd.ngram_state_write(big, _dd.default_ngram_state_dir(big))
        timed("dedup_ngram_incremental_resume_big",
              lambda: _dd.q_dedup_ngram_incremental_resume(big).materialize(),
              trials=2, shuffle=True)

        # trained-IVF production path (VERDICT r3 task 5): spherical-k-means
        # codebook over a driver-side 4096-vector sample, plus recall@k of
        # both codebooks against the exact brute-force top-k ground truth
        import pyarrow.parquet as _pq

        from fluent_plugin_kubernetes_metadata_filter_ray.functions import (
            simsearch as _ss,
        )

        emb_t = _pq.read_table(
            f"{big}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).slice(0, 4096)
        _, _m = _ss._matrix(emb_t)
        _cb = _ss.train_centroids(_m)
        timed("ann_ivf_trained_big",
              lambda: _ss.q_ann_ivf(big, codebook=_cb).materialize(), shuffle=True)
        exact = set(map(tuple,
                        _ss.q_ann_topk(big).to_pandas()[["query_id", "vec_id"]].values))
        ivf_tr = set(map(tuple,
                         _ss.q_ann_ivf(big, codebook=_cb)
                         .to_pandas()[["query_id", "vec_id"]].values))
        ivf_df = set(map(tuple,
                         _ss.q_ann_ivf(big).to_pandas()[["query_id", "vec_id"]].values))
        recall = {
            "ann_ivf_trained_big": round(len(ivf_tr & exact) / len(exact), 3),
            "ann_ivf_default_big": round(len(ivf_df & exact) / len(exact), 3),
        }

        # scale-path decontamination: force the hash semi-join (the shape
        # that replaces the corpus-growing broadcast past
        # DECON_BROADCAST_MAX — VERDICT r2) so its cost is a tracked number
        prior_max = os.environ.get("KMETA_DECON_BROADCAST_MAX")
        os.environ["KMETA_DECON_BROADCAST_MAX"] = "-1"
        try:
            timed("decontaminate_semijoin_big",
                  lambda: fq["q_decontaminate"](big).materialize(),
                  trials=1, shuffle=True)
        finally:  # restore, don't destroy, a user-set value
            if prior_max is None:
                del os.environ["KMETA_DECON_BROADCAST_MAX"]
            else:
                os.environ["KMETA_DECON_BROADCAST_MAX"] = prior_max

        # forced-join TF-IDF / LM scoring (VERDICT r3 task 1): the bounded-
        # broadcast fallback's cost + shuffle bytes as tracked numbers
        for env, qname, bname in (
            ("KMETA_TFIDF_BROADCAST_MAX", "q_doc_tfidf", "doc_tfidf_semijoin_big"),
            ("KMETA_LM_BROADCAST_MAX", "q_doc_lm_score", "lm_score_semijoin_big"),
        ):
            prior = os.environ.get(env)
            os.environ[env] = "-1"
            try:
                timed(bname, lambda qname=qname: fq[qname](big).materialize(),
                      trials=1, shuffle=True)
            finally:
                if prior is None:
                    del os.environ[env]
                else:
                    os.environ[env] = prior

        # round-4 ops at scale: the blocked inverted index (sort-checkpoint
        # + two tiled passes — postings dominated by the pair sort), PQ
        # codebook training + encode, and ADC top-k over the big vectors
        timed("token_postings_big",
              lambda: fq["q_token_postings"](big).materialize(),
              trials=2, shuffle=True)
        timed("embed_pq_big", lambda: fq["q_embed_pq"](big).materialize(),
              shuffle=True)
        timed("ann_pq_big", lambda: fq["q_ann_pq"](big).materialize(),
              shuffle=True)
        # IVF-PQ (r5): residual-trained PQ + probe-restricted ADC — the
        # composed scale tier; recall@k tracked against BOTH parents below
        timed("ann_ivfpq_big", lambda: fq["q_ann_ivfpq"](big).materialize(),
              shuffle=True)
        # persisted ANN index state (T78): codebooks + history codes are
        # written ONCE (untimed — the previous crawl's output at steady
        # state); the timed entry is the recurring crawl-N+1 search, which
        # encodes only the new split and reads history codes from parquet
        _ss.ann_state_write(big, _ss.default_ann_state_dir(big))
        timed("ann_ivfpq_incremental_big",
              lambda: fq["q_ann_ivfpq_incremental"](big).materialize(),
              shuffle=True)
        pq_set = set(map(tuple,
                         _ss.q_ann_pq(big).to_pandas()[["query_id", "vec_id"]].values))
        ivfpq_set = set(map(tuple,
                            _ss.q_ann_ivfpq(big)
                            .to_pandas()[["query_id", "vec_id"]].values))
        recall["ann_pq_big"] = round(len(pq_set & exact) / len(exact), 3)
        recall["ann_ivfpq_big"] = round(len(ivfpq_set & exact) / len(exact), 3)

        # round-4 session additions: the CMS sketch (fixed-size aggregate +
        # vocab join), boundary-overlap counts (thin int64-key join), and
        # the per-source KL diagnostic (vocab-level join) at ~180k docs
        for name in ("q_token_cms", "q_doc_overlap", "q_source_divergence",
                     "q_doc_importance", "q_source_diversity", "q_corpus_diff"):
            timed(name[2:] + "_big",
                  lambda name=name: fq[name](big).materialize(), shuffle=True)

        # windowed dedup over the replicated transcript stream (full-corpus
        # text_hash sort + one lag scan per block)
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
            turn_dedup_window,
        )

        timed("turn_dedup_window",
              lambda: turn_dedup_window(
                  flagship.read_transcripts(SF_DIR, rep=REP)).count())

        # conversation-level dedup over the salted 192k-conv corpus (the
        # conv_concat kernel + a thin per-distinct-document groupby)
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.aggregate import (
            conv_dedup,
        )

        timed("conv_dedup_big", lambda: conv_dedup(_salted()).count())

        # latency percentiles over the replicated transcripts (conv sort +
        # distribution-table aggregate + role^2 map_groups)
        from fluent_plugin_kubernetes_metadata_filter_ray.stages.loganalytics import (
            response_latency,
        )

        timed("response_latency",
              lambda: response_latency(
                  flagship.read_transcripts(SF_DIR, rep=REP)).count())

    # q3 (headline): parse+enrich+route write+per-sink counts (median of 2
    # trials: each writes ~600 MB, so keep the disk churn bounded)
    out_dir = f"/tmp/kmeta_bench_out/cpus{NUM_CPUS}"
    import shutil

    counts_box = []

    def clear_sink():
        shutil.rmtree(out_dir, ignore_errors=True)
        subprocess.run(["sync"], check=False)  # don't bill trial N for N-1's writeback

    def run_e2e():
        counts_box.append(flagship.run_flagship(SF_DIR, out_dir=out_dir, rep=REP).to_pandas())

    timed("flagship_e2e", run_e2e, trials=1 if e2e_only else 2, pre=clear_sink)
    headline = queries["flagship_e2e"]
    counts = counts_box[-1]
    if n_rows is None:
        n_rows = int(counts["n_turns"].sum())
    assert int(counts["n_turns"].sum()) == n_rows

    ray.shutdown()
    out = {
        "metric": "flagship parse→enrich→route e2e",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "trials": trials_out,
        "shuffle_bytes": shuffle_bytes,
        "sf": SF_DIR,
        "rep": REP,
        "rows": n_rows,
        "turns_per_sec": round(n_rows / headline, 1),
        "num_cpus": NUM_CPUS,
    }
    if not e2e_only:
        out["recall_at_k"] = recall
    return out


def run_scaling() -> dict:
    # scaling evidence needs a compute-dominated job: bump rep so fixed
    # costs (init, pool spawn) amortize; run the no-sink-write compute
    # pipeline (single local disk is the one resource that cannot scale
    # with num_cpus in this sandbox — see run_bench "compute" mode)
    scaling_rep = int(os.environ.get("KMETA_SCALING_REP", str(max(REP, 400))))
    lo_cpus, hi_cpus = (
        int(x) for x in os.environ.get("KMETA_SCALING_CPUS", "2,8").split(",")
    )
    # this sandbox VM suffers hypervisor CPU steal that varies over minutes
    # (see BASELINE.md); best-of-N wall time per config estimates the
    # engine's capability rather than the host's momentary congestion
    trials = int(os.environ.get("KMETA_SCALING_TRIALS", "2"))

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            KMETA_BENCH_REP=str(scaling_rep),
            KMETA_BENCH_ONLY="compute",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        # flush dirty pages so the next run doesn't inherit this run's
        # writeback (cross-run contamination skews the comparison)
        subprocess.run(["sync"], check=False)
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        return min((run_once(ncpu) for _ in range(trials)), key=lambda d: d["value"])

    lo, hi = run(lo_cpus), run(hi_cpus)
    eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
    return {
        "metric": f"scaling efficiency (num_cpus {lo_cpus} → {hi_cpus})",
        f"sec_{lo_cpus}": lo["value"],
        f"sec_{hi_cpus}": hi["value"],
        f"turns_per_sec_{lo_cpus}": lo["turns_per_sec"],
        f"turns_per_sec_{hi_cpus}": hi["turns_per_sec"],
        "rows": hi["rows"],
        "rep": lo["rep"],
        "scaling_efficiency": round(eff, 3),
    }


def run_objstore() -> dict:
    """Memory-pressure streaming proof (VERDICT r4 task 5): run the
    flagship e2e and the heaviest dedup pipeline under a HARD object-store
    cap — KMETA_BENCH_OBJSTORE_CAP bytes, default 2 GiB, far below the
    pipelines' total block volume — and record completion + Ray's spill
    counters.  A stage that materialized more than its streaming window
    would stall the plasma store; completing under the cap (with whatever
    spill the executor chose) is the direct single-node evidence that
    every stage streams, i.e. the 100-TB shape holds when the object
    store is the scarce resource."""
    import ray

    cap = int(os.environ.get("KMETA_BENCH_OBJSTORE_CAP", str(2 << 30)))
    os.environ.setdefault("KMETA_QUIET_CLIPS", "1")
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             object_store_memory=cap, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.pipelines import flagship
    from fluent_plugin_kubernetes_metadata_filter_ray.functions import (
        registry as _reg,
        scalegen,
    )

    out: dict = {
        "metric": "objstore-cap streaming proof",
        "unit": "sec",
        "cap_bytes": cap,
        "num_cpus": NUM_CPUS,
        "sf": SF_DIR,
        "rep": REP,
        "queries": {},
    }
    dg.transcripts_path(SF_DIR, rep=REP)  # derive/cache outside the wall
    sink = "/tmp/kmeta_bench_out/objstore"
    import shutil

    shutil.rmtree(sink, ignore_errors=True)
    t0 = time.perf_counter()
    counts = flagship.run_flagship(SF_DIR, out_dir=sink, rep=REP).to_pandas()
    out["queries"]["flagship_e2e"] = round(time.perf_counter() - t0, 3)
    out["rows"] = int(counts["n_turns"].sum())
    out["value"] = out["queries"]["flagship_e2e"]

    big_docs = int(os.environ.get("KMETA_BENCH_BIGDOCS", "20"))
    big_vecs = int(os.environ.get("KMETA_BENCH_BIGVECS", "64"))
    big = scalegen.big_sf_dir(SF_DIR, big_docs, big_vecs)
    fq = _reg.queries()
    t0 = time.perf_counter()
    fq["q_dedup_minhash"](big).materialize()
    out["queries"]["dedup_minhash_big"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    fq["q_dedup_ngram"](big).materialize()
    out["queries"]["dedup_ngram_big"] = round(time.perf_counter() - t0, 3)

    # plasma spill/restore volume for the whole session, from the raylet's
    # own periodic report lines ("Spilled N MiB, M objects ... Restored
    # N MiB") — the grpc-backed memory_summary API isn't available in this
    # container, but the counters land in the session log either way
    import glob
    import re

    spilled = restored = 0
    sess = ray._private.worker._global_node.get_session_dir_path()
    for lf in glob.glob(os.path.join(sess, "logs", "raylet.out")):
        with open(lf, errors="replace") as f:
            for line in f:
                sp = re.search(r"Spilled (\d+) MiB", line)
                rs = re.search(r"Restored (\d+) MiB", line)
                if sp:
                    spilled = max(spilled, int(sp.group(1)))
                if rs:
                    restored = max(restored, int(rs.group(1)))
    out["spilled_mib"] = spilled
    out["restored_mib"] = restored
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--objstore" in sys.argv:
        result = run_objstore()
    elif "--scaling" in sys.argv:
        result = run_scaling()
    else:
        result = run_bench()
    print(json.dumps(result))
