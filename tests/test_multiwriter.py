"""Multi-writer (multi-host analog) dataset generation tests.

Writers are emulated in one process via explicit writer_id/num_writers —
the ownership math and manifests are identical to what jax.process_index/
process_count would produce on a real multi-host runtime. The key
property: the union over writers is BIT-IDENTICAL to a single-writer run
(chunk content is a pure function of global sample indices).
"""
import dataclasses

import numpy as np
import pytest

from ce5g_tpu.data.generator import (
    DatasetGenerator,
    chunk_range_for_writer,
    read_split,
)


def _cfg(small_cfg, fmt="npz", chunk=4):
    return dataclasses.replace(
        small_cfg,
        dataset=dataclasses.replace(
            small_cfg.dataset, save_format=fmt, chunk_size=chunk
        ),
    )


def test_chunk_ranges_partition():
    for n_chunks in (0, 1, 5, 7, 16):
        for p in (1, 2, 3, 5):
            ranges = [chunk_range_for_writer(n_chunks, p, w) for w in range(p)]
            # contiguous, disjoint, covering
            assert ranges[0][0] == 0
            for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
                assert a_hi == b_lo
            assert ranges[-1][1] == n_chunks
            sizes = [hi - lo for lo, hi in ranges]
            assert max(sizes) - min(sizes) <= 1  # balanced


def test_multiwriter_equals_singlewriter(tmp_path, small_cfg):
    cfg = _cfg(small_cfg)
    single = DatasetGenerator(cfg, str(tmp_path / "single"))
    single.generate_split("train", 10, log=lambda *a: None)
    ref = read_split(str(tmp_path / "single" / "train_manifest.json"))

    multi_dir = tmp_path / "multi"
    gen = DatasetGenerator(cfg, str(multi_dir))
    for w in range(3):
        m = gen.generate_split(
            "train", 10, log=lambda *a: None, writer_id=w, num_writers=3
        )
        assert m["completed"] == m["owned_samples"]
    g = gen.write_global_manifest("train", num_writers=3)
    assert g["completed"] == 10
    got = read_split(str(multi_dir / "train_manifest.json"))
    for k in ref:
        if ref[k].dtype.kind == "U":
            assert list(got[k]) == list(ref[k])
        else:
            np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_global_manifest_rejects_incomplete(tmp_path, small_cfg):
    cfg = _cfg(small_cfg)
    gen = DatasetGenerator(cfg, str(tmp_path))
    gen.generate_split("val", 8, log=lambda *a: None, writer_id=0, num_writers=2)
    with pytest.raises(FileNotFoundError):
        gen.write_global_manifest("val", num_writers=2)


def test_multiwriter_resume(tmp_path, small_cfg):
    cfg = _cfg(small_cfg)
    gen = DatasetGenerator(cfg, str(tmp_path))
    m0 = gen.generate_split("test", 12, log=lambda *a: None, writer_id=1, num_writers=2)
    files_before = set(m0["files"])
    # resume: everything reused, nothing regenerated (mtimes unchanged)
    mtimes = {f: (tmp_path / f).stat().st_mtime_ns for f in files_before}
    m1 = gen.generate_split(
        "test", 12, resume=True, log=lambda *a: None, writer_id=1, num_writers=2
    )
    assert set(m1["files"]) == files_before
    for f in files_before:
        assert (tmp_path / f).stat().st_mtime_ns == mtimes[f]


def test_writer_prune_stays_in_lane(tmp_path, small_cfg):
    """A writer pruning its range must not delete other writers' chunks."""
    cfg = _cfg(small_cfg)
    gen = DatasetGenerator(cfg, str(tmp_path))
    gen.generate_split("train", 12, log=lambda *a: None, writer_id=0, num_writers=2)
    gen.generate_split("train", 12, log=lambda *a: None, writer_id=1, num_writers=2)
    files = sorted(p.name for p in tmp_path.glob("train_chunk_*.npz"))
    assert len(files) == 3
    # re-run writer 0 (its prune runs over its own range only)
    gen.generate_split(
        "train", 12, resume=True, log=lambda *a: None, writer_id=0, num_writers=2
    )
    assert sorted(p.name for p in tmp_path.glob("train_chunk_*.npz")) == files
