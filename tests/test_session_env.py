"""Executor-env propagation for the vendored protobuf runtime
(ADVICE r8, medium): driver ``os.environ`` mutations reach Python
workers only in local mode; on standalone/YARN/K8s the toggles must
travel as ``spark.executorEnv.*`` conf, which ``build_session`` folds
in from ``protobuf_executor_env()``."""

import os

from oracle_cassandra_migrator_spark._vendor import (
    _VENDOR_PB, ensure_protobuf, protobuf_executor_env)
from oracle_cassandra_migrator_spark.session import _merge_executor_env


def test_protobuf_executor_env_mirrors_driver_state():
    """After ensure_protobuf() activates the vendored fallback (this
    sandbox has no real install), every env var the driver relies on
    must be reported for executor propagation — including the
    PYTHONPATH entry that makes google.protobuf importable in
    executor-forked workers."""
    assert ensure_protobuf()
    env = protobuf_executor_env()
    # Whichever toggles the driver set must be mirrored verbatim.
    for key in ("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"):
        if key in os.environ:
            assert env[key] == os.environ[key]
    if _VENDOR_PB in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        assert env["PYTHONPATH"] == _VENDOR_PB


def test_merge_executor_env_sets_and_defers_to_user():
    merged = {"spark.executorEnv.TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK":
              "false"}
    _merge_executor_env(merged, {
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION": "python",
        "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK": "true",
    })
    # new key lands; user-supplied value wins for the existing key
    assert merged[
        "spark.executorEnv.PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"
    ] == "python"
    assert merged[
        "spark.executorEnv.TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
    ] == "false"


def test_merge_executor_env_merges_pythonpath():
    """A caller's own executor PYTHONPATH must survive; required
    entries are prepended, duplicates are not re-added."""
    merged = {"spark.executorEnv.PYTHONPATH":
              os.pathsep.join(["/opt/mylibs", _VENDOR_PB])}
    _merge_executor_env(merged, {"PYTHONPATH": _VENDOR_PB})
    assert merged["spark.executorEnv.PYTHONPATH"] == os.pathsep.join(
        ["/opt/mylibs", _VENDOR_PB])

    merged = {"spark.executorEnv.PYTHONPATH": "/opt/mylibs"}
    _merge_executor_env(merged, {"PYTHONPATH": _VENDOR_PB})
    assert merged["spark.executorEnv.PYTHONPATH"] == os.pathsep.join(
        [_VENDOR_PB, "/opt/mylibs"])


def test_build_session_carries_executor_env(spark):
    """The live test session (built via conftest's build_session) must
    expose the executorEnv confs whenever the vendored runtime is on
    the driver's PYTHONPATH."""
    if _VENDOR_PB not in os.environ.get("PYTHONPATH", "").split(
            os.pathsep):
        return  # real protobuf install present; nothing to propagate
    conf = spark.sparkContext.getConf()
    assert conf.get("spark.executorEnv.PYTHONPATH", "") .split(
        os.pathsep)[0] == _VENDOR_PB
    assert conf.get(
        "spark.executorEnv.TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK",
        "") == "true"
