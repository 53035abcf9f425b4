"""Fault tolerance: a worker process dying mid-stage is retried and the
pipeline completes with full results — the Ray analog of the reference's
watch-thread crash-restart ladder (kubernetes_metadata_watch_pods.rb:29-112).
On actor restart the enrich-style state rebuilds in __init__."""

import os

from fluent_plugin_kubernetes_metadata_filter_ray.state.faults import CrashOnFirstCall


def test_pipeline_survives_worker_death(ray_session, tmp_path):
    import ray.data

    flag = str(tmp_path / "crash_flag")
    ds = ray.data.range(1000, override_num_blocks=4).map_batches(
        CrashOnFirstCall,
        fn_constructor_kwargs={"flag_path": flag},
        concurrency=1,
        batch_format="pyarrow",
        max_restarts=2,
        max_task_retries=2,
    )
    assert ds.count() == 1000
    assert os.path.exists(flag)
