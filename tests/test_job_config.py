"""Configuration dot-path accessors + async Job lifecycle."""

import time

import pytest

from go_datax_ray.config import Configuration
from go_datax_ray.pipelines.job import Job, JobState


def test_configuration_dot_paths():
    c = Configuration({"job": {"setting": {"speed": {"channel": 3}},
                               "content": [{"reader": {"name": "r1"}}]}})
    assert c.get_int("job.setting.speed.channel") == 3
    assert c.get_string("job.content.0.reader.name") == "r1"
    assert c.get("job.missing.deep", "dflt") == "dflt"
    c.set("job.setting.errorLimit.record", 5)
    assert c.get_int("job.setting.errorLimit.record") == 5
    clone = c.clone()
    clone.set("job.setting.speed.channel", 99)
    assert c.get_int("job.setting.speed.channel") == 3  # deep clone
    assert c.get_bool("job.nope", True) is True
    assert c.get_float("job.setting.speed.channel") == 3.0


def test_job_lifecycle_success():
    j = Job(lambda: (time.sleep(0.2), 42)[1])
    assert j.status().state is JobState.CREATED
    j.start()
    assert j.status().state is JobState.RUNNING
    assert j.wait() == 42
    assert j.status().state is JobState.SUCCEEDED
    assert j.done()


def test_job_lifecycle_failure():
    def boom():
        raise ValueError("nope")

    j = Job(boom).start()
    with pytest.raises(RuntimeError, match="nope"):
        j.wait()
    assert j.status().state is JobState.FAILED


def test_job_cancel_between_epochs():
    hit = []

    def long_fn():
        for i in range(50):
            if j.cancelled.is_set():
                return i
            hit.append(i)
            time.sleep(0.02)
        return -1

    j = Job(long_fn)
    j.start()
    time.sleep(0.1)
    j.cancel()
    j._thread.join()
    assert j.status().state is JobState.CANCELLED
    assert 0 < len(hit) < 50


def test_job_double_start_rejected():
    j = Job(lambda: 1).start()
    j.wait()
    with pytest.raises(RuntimeError):
        j.start()


def test_job_status_with_metrics():
    from go_datax_ray.state.metrics import get_metrics_actor
    import ray

    m = get_metrics_actor("gdr_job_test")
    ray.get(m.inc.remote("records", 7))
    j = Job(lambda: None, metrics_actor=m).start()
    j.wait()
    assert j.status().counters.get("records") == 7


def test_variable_substitution(tmp_path, monkeypatch):
    """${name} substitution in job JSON (documented-but-unimplemented in
    the reference): explicit vars > environment; unresolved raises."""
    import pytest

    from go_datax_ray.config import JobConfig, substitute_variables

    d = {
        "job": {
            "content": [
                {
                    "reader": {"name": "parquetreader",
                               "parameter": {"path": "${DATA_DIR}/orders.parquet",
                                             "where": [["o_orderkey", ">", "${lastMaxId}"]]}},
                    "writer": {"name": "streamwriter", "parameter": {"print": False}},
                }
            ]
        }
    }
    cfg = JobConfig.from_dict(d, variables={"DATA_DIR": "/data", "lastMaxId": "42"})
    assert cfg.reader_param["path"] == "/data/orders.parquet"
    assert cfg.reader_param["where"][0][2] == "42"
    # environment fallback
    monkeypatch.setenv("DATA_DIR", "/envdata")
    cfg2 = JobConfig.from_dict(d, variables={"lastMaxId": "7"})
    assert cfg2.reader_param["path"] == "/envdata/orders.parquet"
    # unresolved -> loud failure
    monkeypatch.delenv("DATA_DIR")
    with pytest.raises(KeyError, match="DATA_DIR"):
        substitute_variables(d, {"lastMaxId": "7"})
