"""JSONL source parity, custom tag-regex config (U2), stats dump/merge
(C6 dump_stats analog)."""

import json
import os

import pyarrow as pa
import pytest

from fluent_plugin_kubernetes_metadata_filter_ray.config import PipelineConfig


def test_jsonl_source_matches_parquet_path(ray_session, sf_dir, tmp_path):
    import pyarrow.parquet as pq
    import ray.data
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.jsonl import (
        read_transcripts_jsonl,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import (
        decode_stage,
        enrich_stage,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    tdir = dg.transcripts_path(sf_dir)
    first = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))[0]
    tbl = pq.read_table(os.path.join(tdir, first)).slice(0, 200)
    jpath = str(tmp_path / "t.jsonl")
    with open(jpath, "w") as f:
        for row in tbl.to_pylist():
            row["ts"] = row["ts"].isoformat()
            f.write(json.dumps(row) + "\n")

    cfg = PipelineConfig()
    store = dg.metadata_snapshot_dir()

    def run(ds):
        out = decode_stage(enrich_stage(parse_stage(ds, cfg), cfg, store))
        return (
            out.to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    via_jsonl = run(read_transcripts_jsonl(jpath))
    via_parquet = run(ray.data.from_arrow(tbl))
    assert via_jsonl.equals(via_parquet)
    assert len(via_jsonl) == 200


def test_custom_tag_regex(ray_session):
    """U2: user-supplied tag grammar replaces the built-ins."""
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import TagParser

    cfg = PipelineConfig(
        tag_regex_containers=(
            r"^custom\.(?P<namespace>[a-z0-9-]+)\.(?P<pod_name>[a-z0-9-]+)"
            r"\.(?P<container_name>[a-z0-9-]+)-(?P<docker_id>[a-f0-9]{8})$"
        ),
        tag_regex_pods=r"^never-matches$(?P<namespace>x)(?P<pod_name>y)(?P<pod_uuid>z)(?P<container_name>w)",
    )
    batch = pa.table(
        {
            "tool": pa.array(["custom.ns1.podx.app-deadbeef", "other"], pa.string()),
            "text": pa.array(["a", "b"], pa.string()),
        }
    )
    out = TagParser(cfg)(batch)
    assert out.column("namespace").to_pylist() == ["ns1", None]
    assert out.column("docker_id").to_pylist() == ["deadbeef", None]
    assert out.column("matched").to_pylist() == [1, 0]


def test_stats_dump_and_merge(tmp_path):
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.metadata_store import (
        DictMetadataStore,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import Enricher
    from fluent_plugin_kubernetes_metadata_filter_ray.state.stats import (
        collect_dumped_counters,
    )

    d = str(tmp_path / "metrics")
    cfg = PipelineConfig(stats_dump_dir=d, stats_interval=0.0)
    e = Enricher(cfg, store=DictMetadataStore({}, {}), clock=lambda: 1.0)
    batch = pa.table(
        {
            "namespace": pa.array(["ns-a"], pa.string()),
            "pod_name": pa.array(["pod-1"], pa.string()),
            "container_name": pa.array(["app"], pa.string()),
            "docker_id": pa.array([None], pa.string()),
            "cache_key": pa.array(["k1"], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    e(batch)
    merged = collect_dumped_counters(d)
    assert merged["id_cache_miss"] == 1
    assert merged["id_cache_orphaned_record"] == 1
    assert merged["last_batch_rows"] == 1


def test_msgpack_source_matches_parquet_path(ray_session, sf_dir, tmp_path):
    """MessagePackEventStream analog (reference
    test_filter_kubernetes_metadata.rb:727-777): a binary msgpack event
    stream normalizes to the canonical schema and produces IDENTICAL
    enriched output to the parquet path."""
    import pyarrow.parquet as pq
    import ray.data
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.msgpack_stream import (
        read_transcripts_msgpack,
        write_transcripts_msgpack,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import (
        decode_stage,
        enrich_stage,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    tdir = dg.transcripts_path(sf_dir)
    first = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))[0]
    tbl = pq.read_table(os.path.join(tdir, first)).slice(0, 300)
    mdir = str(tmp_path / "mp")
    write_transcripts_msgpack(tbl, mdir, rows_per_file=128)  # >1 file
    assert len(os.listdir(mdir)) >= 2

    cfg = PipelineConfig()
    store = dg.metadata_snapshot_dir()

    def run(ds):
        out = decode_stage(enrich_stage(parse_stage(ds, cfg), cfg, store))
        return (
            out.to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    via_mp = run(read_transcripts_msgpack(mdir))
    via_parquet = run(ray.data.from_arrow(tbl))
    assert via_mp.equals(via_parquet)
    assert len(via_mp) == 300


def test_msgpack_codec_roundtrip_edge_values():
    """Codec edge coverage: nil, negative/large ints, floats, long strings,
    timestamp ext."""
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.msgpack_stream import (
        pack_event,
        unpack_stream,
    )

    events = [
        {"a": None, "b": True, "c": False},
        {"i0": 0, "i1": 127, "i2": -1, "i3": -32, "i4": -33, "i5": 2**40,
         "i6": -(2**40)},
        {"f": 3.5, "s": "x" * 31, "t": "y" * 300},
        {"ts": ("ts_us", 1_700_000_000_123_456)},
    ]
    buf = bytearray()
    for e in events:
        pack_event(e, buf)
    out = unpack_stream(bytes(buf))
    assert out == events


def test_msgpack_codec_roundtrip_property():
    """Property: any event map of the supported value types round-trips
    through the codec byte-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fluent_plugin_kubernetes_metadata_filter_ray.sources.msgpack_stream import (
        pack_event,
        unpack_stream,
    )

    value = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=300),
        st.tuples(st.just("ts_us"),
                  st.integers(min_value=0, max_value=2**40 * 1_000_000)),
    )
    events = st.lists(
        st.dictionaries(st.text(min_size=1, max_size=40), value, max_size=15),
        min_size=1, max_size=5,
    )

    @settings(max_examples=150, deadline=None)
    @given(events)
    def check(evs):
        buf = bytearray()
        for e in evs:
            pack_event(e, buf)
        assert unpack_stream(bytes(buf)) == evs

    check()


def test_jsonl_sink_roundtrip(ray_session, sf_dir, tmp_path):
    """route_write_jsonl: per-role JSONL sinks hold exactly the enriched
    rows (routed-row equality per sink — the Parquet sink's contract,
    proven for the JSON fan-out too)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.pipelines import flagship
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import enrich as en
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.route import (
        read_jsonl_sink,
        route_write_jsonl,
    )

    out = str(tmp_path / "jsonl_sinks")
    route_write_jsonl(flagship.build_enriched(sf_dir), out)

    got = (
        read_jsonl_sink(out, ["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        en.decode_stage(flagship.build_enriched(sf_dir))
        .to_pandas()[["conv_id", "turn_idx", "role", "text"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 1000
    assert (got["text"].fillna("@") == want["text"].fillna("@")).all()
    assert (got["role"].astype(str) == want["role"].astype(str)).all()
    # one sink dir per role present in the ENRICHED source of truth (the
    # sink read-back would shrink together with a dropped role)
    import os as _os

    sink_dirs = sorted(d for d in _os.listdir(out) if d.startswith("role="))
    assert sink_dirs == sorted(f"role={r}" for r in want["role"].unique())


def test_jsonl_sink_keeps_null_and_unknown_roles(ray_session, tmp_path):
    """Code-review r3: a NULL, out-of-vocabulary, or path-hostile role must
    land in its own sink and ROUND-TRIP to its original value — the
    parquet twin's partition_cols path writes every row and the JSONL
    fan-out must too.  'a/b' and '%00' (the sentinel's literal spelling)
    are the adversarial dir-name cases; quote/decode keeps them apart."""
    import pyarrow as pa
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages.route import (
        read_jsonl_sink,
        route_write_jsonl,
    )

    roles = ["user", None, "critic", "a/b", "%00"]
    rows = pa.table(
        {
            "conv_id": pa.array(["c"] * 5, pa.string()),
            "turn_idx": pa.array(range(5), pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    out = str(tmp_path / "nullrole")
    route_write_jsonl(ray.data.from_arrow(rows), out)

    got = (
        read_jsonl_sink(out, ["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == ["a", "b", "c", "d", "e"]  # nothing vanished
    assert got["role"].where(got["role"].notna(), None).tolist() == roles  # lossless

    # empty stream: an empty sink dir, not a crash (unique() returns None)
    out2 = str(tmp_path / "emptyroles")
    route_write_jsonl(ray.data.from_arrow(rows.slice(0, 0)), out2)
    import os as _os

    assert _os.listdir(out2) == []


def test_parquet_fallback_roles_roundtrip(ray_session, tmp_path, monkeypatch):
    """ADVICE r3: the older-Ray manual fan-out writes percent-encoded role
    dirs; read_sink must decode them back (marker file) so 'a/b' and NULL
    round-trip losslessly on that path too.  Simulated by making
    partition_cols raise TypeError like a pre-partition_cols Ray."""
    import pyarrow as pa
    import ray.data
    from ray.data import Dataset

    from fluent_plugin_kubernetes_metadata_filter_ray.stages import route

    orig = Dataset.write_parquet

    def no_partition_cols(self, path, **kw):
        if "partition_cols" in kw:
            raise TypeError("partition_cols unsupported (simulated older Ray)")
        return orig(self, path)

    monkeypatch.setattr(Dataset, "write_parquet", no_partition_cols)

    roles = ["user", None, "critic", "a/b", "%00"]
    rows = pa.table(
        {
            "conv_id": pa.array(["c"] * 5, pa.string()),
            "turn_idx": pa.array(range(5), pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    out = str(tmp_path / "pqfallback")
    route.route_write(ray.data.from_arrow(rows), out)
    assert os.path.exists(os.path.join(out, route._ENCODED_MARKER))

    got = (
        route.read_sink(out, ["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == ["a", "b", "c", "d", "e"]
    assert got["role"].where(got["role"].notna(), None).tolist() == roles


def test_jsonl_bucketed_fanout_high_cardinality(ray_session, tmp_path):
    """VERDICT r3 task 7: 1k distinct roles must NOT trigger 1k filtered
    dataset passes — past JSONL_FANOUT_MAX_ROLES the sink writes ONE
    hash-bucketed pass (bucket-NNN dirs, role in-file) and the round-trip
    stays value-lossless, null and path-hostile roles included."""
    import pyarrow as pa
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray.stages import route

    n = 1000
    roles = [f"sink-{i}" for i in range(n - 3)] + [None, "a/b", "%00"]
    rows = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
        }
    )
    out = str(tmp_path / "bucketed")
    route.route_write_jsonl(ray.data.from_arrow(rows), out)

    assert os.path.exists(os.path.join(out, route._BUCKETED_MARKER))
    bdirs = [d for d in os.listdir(out) if d.startswith("bucket-")]
    assert 0 < len(bdirs) <= route.JSONL_N_BUCKETS  # bucket dirs, not 1k role dirs

    got = (
        route.read_jsonl_sink(out, ["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert len(got) == n  # nothing vanished
    assert got["role"].where(got["role"].notna(), None).tolist() == roles  # lossless
    assert got["text"].tolist() == [f"t{i}" for i in range(n)]

    # one role's rows all live in ONE bucket dir (md5 is process-stable)
    b = route._role_bucket("sink-7")
    one = (
        route.read_jsonl_sink(out, ["role", "text"])
        .to_pandas()
    )
    import glob as _glob
    in_bucket = set()
    for f in _glob.glob(os.path.join(out, f"bucket-{b:03d}", "*.json")):
        import json as _json
        with open(f) as fh:
            for line in fh:
                in_bucket.add(_json.loads(line)["role"])
    assert "sink-7" in in_bucket


def test_rawlog_tail_source_matches_parquet_path(ray_session, sf_dir, tmp_path):
    """The in_tail twin: docker-format container-log files with the kube tag
    derived from the FILE PATH (not a column) must flow through parse →
    enrich identically to the same rows read from parquet."""
    import pyarrow.parquet as pq_
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.rawlog import (
        _tag_to_relpath,
        read_container_logs,
        write_container_logs,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import enrich as en
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    tdir = dg.transcripts_path(sf_dir)
    t = pq_.read_table(tdir).slice(0, 300)
    # every derived-transcript tool is a tag; null text/role rows exercise
    # the docker-line null spellings
    logdir = str(tmp_path / "containers")
    n = write_container_logs(t, logdir)
    mask = [_tag_to_relpath(v) is not None for v in t.column("tool").to_pylist()]
    assert n == sum(mask) and n >= 200  # ~10% of derived tools are hostile/non-tag
    grams = {v.split(".")[2] for v, m in zip(t.column("tool").to_pylist(), mask) if m}
    assert grams == {"containers", "pods"}  # both tail grammars exercised

    def run(ds):
        parsed = parse_stage(ds, DEFAULT_CONFIG)
        out = en.decode_stage(
            en.enrich_stage(parsed, DEFAULT_CONFIG, dg.metadata_snapshot_dir())
        ).to_pandas()
        key = ["conv_id", "turn_idx", "text"]
        return (
            out.sort_values(key, kind="mergesort", na_position="last")
            .reset_index(drop=True)[sorted(out.columns)]
        )

    via_tail = run(read_container_logs(logdir))
    via_parquet = run(ray.data.from_arrow(t.filter(pa.array(mask))))
    assert len(via_tail) == n
    pdt = via_tail.fillna("@").astype(str)
    pdp = via_parquet.fillna("@").astype(str)
    assert pdt.equals(pdp), (via_tail.head(), via_parquet.head())


def test_rawlog_tag_mappability_python_sql_parity():
    """Which tools are tail-mappable must agree bit-for-bit between
    _tag_to_relpath (engine) and the oracle's WHERE clause — including
    path-hostile tags with '/', backslash, and grammar near-misses."""
    import duckdb

    from fluent_plugin_kubernetes_metadata_filter_ray.sources import rawlog

    tools = [
        "var.log.containers.pod-0_ns-5_app-" + "0" * 64 + ".log",
        "var.log.pods.ns-4_pod-1_abc.app.0.log",
        "var.log.containers.evil/../../etc/passwd.log",  # traversal
        "var.log.containers.back\\slash.log",
        "var.log.containers.log",          # empty name (grammar near-miss)
        "var.log.pods.a.b.c.log",          # non-numeric index
        "not.a.kube.tag",
        "",
        None,
    ]
    py = [rawlog._tag_to_relpath(t) is not None for t in tools]
    where = rawlog.transcripts_rawlog_oracle_sql().split("WHERE", 1)[1]
    con = duckdb.connect()
    sql = [
        bool(con.execute(f"SELECT ({where.replace('tool', '?::VARCHAR')})"
                         .replace("?::VARCHAR", "$1::VARCHAR"), [t]).fetchone()[0] or False)
        if t is not None else False
        for t in tools
    ]
    assert py == sql, (py, sql)
    # the traversal tag is rejected, not written outside the sink
    assert rawlog._tag_to_relpath(tools[2]) is None


def test_rawlog_bare_docker_lines(ray_session, tmp_path):
    """REAL docker logs carry only log/stream/time — the merged transcript
    keys are optional.  Bare lines must flow through (tag from path, null
    conv_id/turn_idx/role) and enrich off the path-derived tag; an empty
    log file must not crash the read."""
    import ray.data

    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.config import DEFAULT_CONFIG
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.rawlog import read_container_logs
    from fluent_plugin_kubernetes_metadata_filter_ray.stages import enrich as en
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    d = str(tmp_path / "bare")
    os.makedirs(d + "/var/log/containers", exist_ok=True)
    tag_file = d + "/var/log/containers/pod-0_ns-0_app-" + "0" * 64 + ".log"
    with open(tag_file, "w") as f:
        f.write('{"log": "hello", "stream": "stdout", "time": "2024-01-01T00:00:00.5Z"}\n')
        f.write('{"log": "no time here", "stream": "stderr"}\n')
    open(d + "/var/log/containers/pod-1_ns-0_app-" + "1" * 64 + ".log", "w").close()

    ds = read_container_logs(d)
    out = ds.to_pandas().sort_values("text").reset_index(drop=True)
    assert len(out) == 2
    assert out["conv_id"].isna().all() and out["role"].isna().all()
    assert out["text"].tolist() == ["hello", "no time here"]
    assert out["ts"].notna().tolist() == [True, False]
    assert (out["tool"].str.startswith("var.log.containers.pod-0_ns-0_app-")).all()

    # the path-derived tag enriches like any other record
    enriched = en.decode_stage(
        en.enrich_stage(
            parse_stage(read_container_logs(d), DEFAULT_CONFIG),
            DEFAULT_CONFIG,
            dg.metadata_snapshot_dir(),
        )
    ).to_pandas()
    assert len(enriched) == 2
    assert (enriched["k8s_pod_name"] == "pod-0").all()


def test_csv_source_matches_parquet_path(ray_session, sf_dir, tmp_path):
    """CSV feed parity: transcript shards written as RFC-4180 CSV read back
    bit-identical through the full parse→enrich path (same contract as the
    JSONL/msgpack feeds)."""
    import pyarrow.parquet as pq
    import ray.data
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.csvsrc import (
        read_transcripts_csv,
        write_transcripts_csv,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import (
        decode_stage,
        enrich_stage,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    tdir = dg.transcripts_path(sf_dir)
    first = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))[0]
    tbl = pq.read_table(os.path.join(tdir, first)).slice(0, 300)
    cdir = str(tmp_path / "csv")
    write_transcripts_csv(tbl, cdir, shard_rows=128)  # >1 shard
    assert len(os.listdir(cdir)) >= 2

    cfg = PipelineConfig()
    store = dg.metadata_snapshot_dir()

    def run(ds):
        out = decode_stage(enrich_stage(parse_stage(ds, cfg), cfg, store))
        return (
            out.to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    via_csv = run(read_transcripts_csv(cdir))
    via_parquet = run(ray.data.from_arrow(tbl))
    assert via_csv.equals(via_parquet)
    assert len(via_csv) == 300


def test_csv_roundtrip_null_vs_empty_and_quoting(ray_session, tmp_path):
    """The two classic CSV traps, pinned: null vs '' survive distinctly
    (unquoted empty vs quoted \"\"), and embedded commas/quotes/newlines
    round-trip via RFC-4180 quoting."""
    import datetime as _dt

    from fluent_plugin_kubernetes_metadata_filter_ray.sources.csvsrc import (
        TRANSCRIPT_TYPES,
        read_transcripts_csv,
        write_transcripts_csv,
    )

    ts = _dt.datetime(2026, 1, 2, 3, 4, 5, 123456)
    tbl = pa.table(
        {
            "conv_id": ["c1", "c2", "c3", "00042"],
            "turn_idx": pa.array([0, 1, None, 3], pa.int32()),
            "role": ["user", None, "", "assistant"],
            "text": ['a,"b"\nc', "", None, "plain"],
            "tool": [None, "", "x", None],
            "ts": pa.array([ts, None, ts, ts], pa.timestamp("us")),
        }
    )
    cdir = str(tmp_path / "csv_edge")
    write_transcripts_csv(tbl, cdir)
    back = (
        read_transcripts_csv(cdir)
        .to_pandas()
        .sort_values("conv_id", kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        tbl.to_pandas().sort_values("conv_id", kind="mergesort").reset_index(drop=True)
    )
    assert back.equals(exp)
    # the all-digit conv_id stayed a string (schema pin beats inference)
    assert back["conv_id"].iloc[0] == "00042"
    assert set(TRANSCRIPT_TYPES) == set(tbl.column_names)


def test_orc_source_matches_parquet_path(ray_session, sf_dir, tmp_path):
    """ORC feed parity: shards decoded via pyarrow.orc inside the binary
    fan-out must run the full parse→enrich path bit-identical to parquet,
    including null-vs-'' and the µs timestamp unit."""
    import pyarrow.parquet as pq
    import ray.data
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.orcsrc import (
        read_transcripts_orc,
        write_transcripts_orc,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.enrich import (
        decode_stage,
        enrich_stage,
    )
    from fluent_plugin_kubernetes_metadata_filter_ray.stages.parse import parse_stage

    tdir = dg.transcripts_path(sf_dir)
    first = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))[0]
    tbl = pq.read_table(os.path.join(tdir, first)).slice(0, 300)
    odir = str(tmp_path / "orc")
    write_transcripts_orc(tbl, odir, shard_rows=128)  # >1 shard
    assert len(os.listdir(odir)) >= 2

    back = read_transcripts_orc(odir)
    sch = back.schema()  # ray Schema wrapper: names + arrow types
    assert dict(zip(sch.names, sch.types))["ts"] == pa.timestamp("us")

    cfg = PipelineConfig()
    store = dg.metadata_snapshot_dir()

    def run(ds):
        out = decode_stage(enrich_stage(parse_stage(ds, cfg), cfg, store))
        return (
            out.to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort")
            .reset_index(drop=True)
        )

    via_orc = run(read_transcripts_orc(odir))
    via_parquet = run(ray.data.from_arrow(tbl))
    assert via_orc.equals(via_parquet)
    assert len(via_orc) == 300


def test_jsonl_gz_source_round_trip(ray_session, sf_dir, tmp_path):
    """Gzip JSONL shards round-trip the canonical transcript table exactly
    (null vs empty string, µs timestamps, embedded newlines escape in
    JSON), and the read fans out one task per shard."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    from fluent_plugin_kubernetes_metadata_filter_ray import datagen as dg
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.jsonl import (
        read_transcripts_jsonl_gz,
        write_transcripts_jsonl_gz,
    )

    tdir = dg.transcripts_path(sf_dir)
    first = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))[0]
    tbl = pq.read_table(os.path.join(tdir, first)).slice(0, 199)
    # hostile rows: null text, EMPTY text (must stay distinct from null),
    # newline in text, null ts
    extra = pa.table(
        {
            "conv_id": pa.array(["z", "z", "z", None], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "role": pa.array(["user", "user", "", None], pa.string()),
            "text": pa.array([None, "", "a\nb\tc", "x"], pa.string()),
            "tool": pa.array([None, "", None, ""], pa.string()),
            "ts": pa.array([None, 0, 1, None], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    tbl = pa.concat_tables([tbl.select(extra.column_names), extra])

    out = str(tmp_path / "gz")
    n = write_transcripts_jsonl_gz(tbl, out, shard_rows=64)  # several shards
    assert n == tbl.num_rows
    assert len([f for f in os.listdir(out) if f.endswith(".jsonl.gz")]) >= 4

    back = read_transcripts_jsonl_gz(out).to_pandas()
    want = tbl.to_pandas()
    key = ["conv_id", "turn_idx"]
    back = back.sort_values(key, kind="mergesort", na_position="last").reset_index(drop=True)
    want = want.sort_values(key, kind="mergesort", na_position="last").reset_index(drop=True)
    for c in want.columns:
        am, bm = back[c].fillna("@").astype(str), want[c].fillna("@").astype(str)
        assert (am == bm).all(), f"{c}: {back[c].tolist()[:5]} vs {want[c].tolist()[:5]}"
    # null and empty string survived as DIFFERENT values
    z = back[back["conv_id"] == "z"].sort_values("turn_idx")
    assert z["text"].tolist()[1] == "" and pd.isna(z["text"].tolist()[0])


def test_rawlog_pos_file_exactly_once(ray_session, tmp_path):
    """The in_tail pos_file contract: across runs with appended lines,
    grown files, and brand-new files, every log line is ingested EXACTLY
    once — and size-unchanged files are never even opened (asserted by
    corrupting one after commit: a skip-path re-read would crash)."""
    from fluent_plugin_kubernetes_metadata_filter_ray.sources.rawlog import (
        commit_pos,
        ingest_container_logs,
        read_container_logs,
    )

    log_dir = str(tmp_path / "logs")
    pos = str(tmp_path / "pos.json")
    f1 = os.path.join(log_dir, "var/log/containers/a_ns1_app-" + "0" * 64 + ".log")
    f2 = os.path.join(log_dir, "var/log/containers/b_ns2_app-" + "1" * 64 + ".log")
    os.makedirs(os.path.dirname(f1), exist_ok=True)

    def line(i):
        return json.dumps({"log": f"msg {i}", "stream": "stdout",
                           "time": "2026-01-01T00:00:0%d.5Z" % (i % 10)}) + "\n"

    with open(f1, "w") as f:
        f.write(line(0) + line(1))
    r1 = ingest_container_logs(log_dir, pos).to_pandas()
    assert sorted(r1["text"]) == ["msg 0", "msg 1"]
    commit_pos(log_dir, pos)

    # run 2: nothing changed → zero rows, no file opened
    r2 = ingest_container_logs(log_dir, pos)
    assert r2.count() == 0

    # run 3: f1 grows by two lines, f2 is new
    with open(f1, "a") as f:
        f.write(line(2) + line(3))
    with open(f2, "w") as f:
        f.write(line(7))
    r3 = ingest_container_logs(log_dir, pos).to_pandas()
    assert sorted(r3["text"]) == ["msg 2", "msg 3", "msg 7"]
    commit_pos(log_dir, pos)

    # skip proof: make f1 UNPARSEABLE without changing its size; a run that
    # wrongly re-opened it would crash in the JSON reader
    size = os.path.getsize(f1)
    with open(f1, "w") as f:
        f.write("{" * (size - 1) + "\n")
    assert os.path.getsize(f1) == size
    r4 = ingest_container_logs(log_dir, pos)
    assert r4.count() == 0

    # union across runs == one full tail read (restore f1 first)
    with open(f1, "w") as f:
        f.write(line(0) + line(1) + line(2) + line(3))
    full = read_container_logs(log_dir).to_pandas()
    got = sorted(list(r1["text"]) + list(r3["text"]))
    assert got == sorted(full["text"])
