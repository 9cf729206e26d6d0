"""Scratch-root selection + checkpoint-manager version-proofing.

Round-14 items (VERDICT r13 #2/#3): /dev/shm is RAM -- pick it only when
its free space clears a floor; the Spark-4.1-pinned checkpoint-manager
class must be probed, not assumed.
"""

from __future__ import annotations

import tempfile

from flink_training_exercises_spark import scratch, session


def test_scratch_env_override_wins(monkeypatch, tmp_path):
    d = tmp_path / "scr"
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(d))
    assert scratch.scratch_root() == str(d)
    assert d.is_dir()


def test_scratch_shm_needs_free_space(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    # plenty free -> tmpfs picked
    monkeypatch.setattr(scratch, "_free_bytes", lambda p: 64 * 2**30)
    assert scratch.scratch_root().startswith(scratch._SHM)
    # below the floor -> system tmp, the pre-r13 behavior
    monkeypatch.setattr(scratch, "_free_bytes", lambda p: 1 * 2**30)
    assert scratch.scratch_root() == tempfile.gettempdir()
    # floor is env-tunable
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_MIN_GB", "0.5")
    assert scratch.scratch_root().startswith(scratch._SHM)


def test_scratch_free_bytes_real_path():
    # statvfs on a real dir returns something positive; on a bogus path, 0
    assert scratch._free_bytes("/") > 0
    assert scratch._free_bytes("/definitely/not/a/path") == 0


def test_ckpt_manager_set_on_spark41(spark):
    # On this Spark line the probe succeeds and the conf is applied.
    assert (
        spark.conf.get("spark.sql.streaming.checkpointFileManagerClass")
        == session._CKPT_FM_41
    )


def test_ckpt_manager_skipped_when_class_missing(spark, monkeypatch):
    key = "spark.sql.streaming.checkpointFileManagerClass"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.unset(key)
        monkeypatch.setattr(
            session, "_CKPT_FM_41", "org.example.NoSuchCheckpointManager"
        )
        session._apply_ckpt_file_manager(spark)
        # probe failed -> conf left at Spark's own default (unset)
        assert spark.conf.get(key, None) is None
    finally:
        if saved is not None:
            spark.conf.set(key, saved)


def test_ckpt_manager_explicit_env_applied_unprobed(spark, monkeypatch):
    key = "spark.sql.streaming.checkpointFileManagerClass"
    saved = spark.conf.get(key, None)
    try:
        monkeypatch.setenv("SPARK_GRAFT_CKPT_FM", "org.example.MyManager")
        session._apply_ckpt_file_manager(spark)
        assert spark.conf.get(key) == "org.example.MyManager"
    finally:
        if saved is not None:
            spark.conf.set(key, saved)
