"""Dataset generation: batched simulation → LS feature → chunked files.

Parity surface:
  * per-sample random draw of (channel type × Doppler × SNR × pilot
    density) from the config lists — reference dataset_generator.py:114-117;
  * the LS estimate stored as the model input feature — reference
    dataset_generator.py:66-81 (with the rx-replicated-over-tx quirk
    handled inside estimators; SURVEY §2.2);
  * chunked output + JSON progress checkpoint + --resume + merge —
    reference run_phase3_robust.py:95-310;
  * npz and HDF5 formats with channel_type strings — reference
    dataset_generator.py:145-180.

TPU-first design: the whole chunk is ONE jit call (`generate_chunk_fn`)
vmapped over frames; per-sample keys are `fold_in(split_key, idx)`
(utils/rng.py), so any chunk can be regenerated independently on any
host/shard — the checkpoint is just a count, not RNG state. With a mesh,
frames shard over the 'data' axis (zero-communication DP) and only the
finished chunk is pulled to host.
"""
from __future__ import annotations

import functools
import json
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..estimators.api import estimate_batch
from ..physics.profiles import PROFILE_INDEX, PROFILE_NAMES
from ..physics.simulate import FrameParams, simulate_batch, table_for
from ..utils.host import get_numpy
from ..utils.rng import split_key

#: arrays stored per split (reference sample dict, dataset_generator.py:77-87)
CHUNK_KEYS = (
    "rx_symbols",
    "tx_symbols",
    "H_true",
    "H_ls",
    "pilot_mask",
    "snr_db",
    "doppler_hz",
    "pilot_density",
    "profile_idx",
)


def draw_params(keys, cfg: ExperimentConfig) -> FrameParams:
    """Per-frame uniform draws from the config lists
    (reference dataset_generator.py:114-117). `keys` is a batch of PRNG
    keys; each frame draws independently, so the result is identical
    however frames are sharded."""
    profile_ids = jnp.asarray(
        [PROFILE_INDEX[m] for m in cfg.channel.models], jnp.int32
    )
    dopplers = jnp.asarray(cfg.channel.doppler_hz, jnp.float32)
    snrs = jnp.asarray(cfg.simulation.snr_range_db, jnp.float32)
    densities = jnp.asarray(cfg.pilots.density, jnp.float32)

    def draw_one(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return FrameParams(
            profile_idx=profile_ids[jax.random.randint(k1, (), 0, len(profile_ids))],
            doppler_hz=dopplers[jax.random.randint(k2, (), 0, len(dopplers))],
            snr_db=snrs[jax.random.randint(k3, (), 0, len(snrs))],
            pilot_density=densities[jax.random.randint(k4, (), 0, len(densities))],
        )

    return jax.vmap(draw_one)(keys)


import dataclasses as _dc

from ..config import DatasetConfig as _DSC
from ..config import ModelConfig as _MC
from ..config import TrainingConfig as _TC


def _generation_key(cfg: ExperimentConfig) -> ExperimentConfig:
    """Strip every field the chunk function does not read (dataset/model/
    training/paths) so configs differing only there — e.g. a save_format
    or chunk_size variant, or a test fixture with a different model —
    share ONE compiled generation program instead of recompiling the
    whole pipeline."""
    return _dc.replace(
        cfg,
        dataset=_DSC(),
        model=_MC(),
        training=_TC(),
        data_dir=".",
        model_dir=".",
        results_dir=".",
        log_dir=".",
    )


@functools.lru_cache(maxsize=8)
def _chunk_fn_cached(cfg: ExperimentConfig) -> Callable:
    """One jitted chunk function per GENERATION-relevant config value.
    ExperimentConfig is a frozen hashable dataclass, so this caches on
    VALUE: every DatasetGenerator (and test fixture) with the same
    physics/pilot/simulation settings reuses one compiled program
    instead of re-tracing a fresh closure — jax's jit cache is keyed by
    function identity, which a per-instance closure always misses."""
    return generate_chunk_fn(cfg, table_for(cfg))


def generate_chunk_fn(cfg: ExperimentConfig, table=None) -> Callable:
    """jit-compiled keys → chunk dict (one device round-trip per chunk)."""
    if table is None:
        table = table_for(cfg)

    def chunk(keys):
        kp = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
        ks = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        params = draw_params(kp, cfg)
        frames = simulate_batch(ks, params, cfg=cfg, table=table)
        h_ls = estimate_batch(
            frames,
            cfg=cfg,
            estimator="ls",
            method=cfg.pilots.interpolation,
            table=table,
        )
        return {
            "rx_symbols": frames.rx_symbols,
            "tx_symbols": frames.tx_symbols,
            "H_true": frames.channel,
            "H_ls": h_ls,
            "pilot_mask": frames.pilot_mask,
            "snr_db": params.snr_db,
            "doppler_hz": params.doppler_hz,
            "pilot_density": params.pilot_density,
            "profile_idx": params.profile_idx,
        }

    return jax.jit(chunk)


# ----------------------------------------------------------------- file I/O
#: save_format value → file extension ('ce5g' is the fast native-codec
#: container, data/ce5g_format.py; npz/h5 are reference-parity formats)
FORMAT_EXT = {"npz": "npz", "h5": "h5", "ce5g": "ce5g"}


def _write_npz(path: Path, arrays: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **arrays)


def _write_h5(path: Path, arrays: Dict[str, np.ndarray]) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            if v.dtype.kind == "U":  # channel_type → S10 (reference :171-176)
                f.create_dataset(k, data=v.astype("S10"))
            else:
                f.create_dataset(k, data=v, compression="gzip")


def _read_h5(path: Path) -> Dict[str, np.ndarray]:
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for k in f:
            v = f[k][()]
            if v.dtype.kind == "S":
                v = v.astype("U10")
            out[k] = v
    return out


def _write_chunk(path: Path, arrays: Dict[str, np.ndarray], fmt: str) -> None:
    if fmt == "h5":
        _write_h5(path, arrays)
    elif fmt == "ce5g":
        from .ce5g_format import write_ce5g

        write_ce5g(path, arrays)
    else:
        _write_npz(path, arrays)


def read_chunk(path: Path) -> Dict[str, np.ndarray]:
    p = Path(path)
    if p.suffix == ".h5":
        return _read_h5(p)
    if p.suffix == ".ce5g":
        from .ce5g_format import read_ce5g

        return read_ce5g(p)
    with np.load(p, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def read_split(path: str) -> Dict[str, np.ndarray]:
    """Load a merged file or a manifest (concatenating its chunks)."""
    p = Path(path)
    if p.suffix == ".json":
        manifest = json.loads(p.read_text())
        parts = [read_chunk(p.parent / f) for f in manifest["files"]]
        return {k: np.concatenate([q[k] for q in parts], axis=0) for k in parts[0]}
    return read_chunk(p)


def chunk_range_for_writer(
    num_chunks: int, num_writers: int, writer_id: int
) -> "tuple[int, int]":
    """Balanced contiguous chunk block [lo, hi) owned by ``writer_id``."""
    if not (0 <= writer_id < num_writers):
        raise ValueError(f"writer_id {writer_id} outside [0, {num_writers})")
    base, extra = divmod(num_chunks, num_writers)
    lo = writer_id * base + min(writer_id, extra)
    return lo, lo + base + (1 if writer_id < extra else 0)


# ---------------------------------------------------------------- generator
class DatasetGenerator:
    """Chunked, resumable, optionally mesh-sharded dataset factory."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        output_dir: str,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.cfg = cfg
        self.out = Path(output_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh
        self.table = table_for(cfg)
        self._fn = _chunk_fn_cached(_generation_key(cfg))
        self._n_data = int(mesh.shape["data"]) if mesh is not None else 1

    # -- paths
    def _ext(self) -> str:
        return FORMAT_EXT.get(self.cfg.dataset.save_format, "npz")

    def _chunk_path(self, split: str, chunk_idx: int) -> Path:
        return self.out / f"{split}_chunk_{chunk_idx:05d}.{self._ext()}"

    def _manifest_path(
        self, split: str, writer_id: int = 0, num_writers: int = 1
    ) -> Path:
        if num_writers > 1:
            return self.out / f"{split}_manifest_w{writer_id:03d}.json"
        return self.out / f"{split}_manifest.json"

    def _fingerprint(self) -> str:
        """Identity of everything that determines sample content + file
        format. Resume is only valid when this matches the previous run;
        anything else (different seed, SNR grid, save_format, …) would mix
        incompatible chunks in one manifest."""
        c = self.cfg
        return json.dumps(
            {
                "seed": c.seed,
                "format": c.dataset.save_format,
                "models": list(c.channel.models),
                "doppler": list(map(float, c.channel.doppler_hz)),
                "snr": list(map(float, c.simulation.snr_range_db)),
                "density": list(map(float, c.pilots.density)),
                "interp": c.pilots.interpolation,
                "ofdm": [c.ofdm.fft_size, c.ofdm.cp_length, c.ofdm.num_symbols,
                         c.ofdm.num_used_subcarriers],
                "mimo": [c.mimo.num_tx, c.mimo.num_rx],
            },
            sort_keys=True,
        )

    # -- core
    def _keys_for(self, split: str, idxs: np.ndarray):
        sk = split_key(self.cfg.seed, split)
        return jax.vmap(lambda i: jax.random.fold_in(sk, i))(jnp.asarray(idxs))

    def _run_chunk(self, split: str, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        n = len(idxs)
        # Pad every chunk to the full chunk_size (and mesh divisibility):
        # a trailing partial chunk then reuses the full chunk's compiled
        # program instead of paying a fresh whole-pipeline XLA compile for
        # its one-off shape. Padded rows are sliced off after the fetch.
        target = max(self.cfg.dataset.chunk_size, n)
        target += (-target) % self._n_data
        pad = target - n
        keys = self._keys_for(split, np.concatenate([idxs, idxs[:1].repeat(pad)]) if pad else idxs)
        if self.mesh is not None:
            from ..parallel.mesh import data_sharding

            keys = jax.device_put(keys, data_sharding(self.mesh))
        out = get_numpy(self._fn(keys))
        if pad:
            out = {k: v[:n] for k, v in out.items()}
        out["channel_type"] = np.asarray(PROFILE_NAMES, dtype="<U10")[
            out.pop("profile_idx").astype(np.int64) % len(PROFILE_NAMES)
        ]
        return out

    def generate_split(
        self,
        split: str,
        num_samples: int,
        resume: bool = False,
        log=print,
        writer_id: Optional[int] = None,
        num_writers: Optional[int] = None,
    ) -> Dict:
        """Generate `num_samples` frames for `split` in chunk files.

        Resumable: the manifest records completed chunks; per-sample keys
        are pure functions of (seed, split, index), so restarting never
        changes the data (reference run_phase3_robust.py:144-156 semantics
        without RNG-state fragility).

        Chunk i always covers the fixed index range
        [i·chunk_size, min((i+1)·chunk_size, num_samples)). On resume with
        a different ``num_samples``, only the contiguous prefix of FULL
        chunks valid under both the old and new totals is reused; the
        trailing partial chunk (and anything after it) is regenerated —
        deterministic per-sample keys make the regenerated data identical,
        so growing or shrinking a split never drops or duplicates samples.

        Multi-host: with ``num_writers`` > 1 (defaults to
        ``jax.process_count()``), writer ``writer_id`` generates only its
        contiguous block of chunks and writes a per-writer manifest —
        NO host serializes the others' output (SURVEY §5.8 obligation).
        Because chunk content is a pure function of global sample indices,
        the union over writers is bit-identical to a single-writer run.
        After all writers finish (callers on real multi-host runtimes
        should barrier, e.g. ``multihost_utils.sync_global_devices``),
        :meth:`write_global_manifest` assembles the standard manifest.
        """
        if num_writers is None:
            num_writers = jax.process_count()
            writer_id = jax.process_index()
        writer_id = writer_id or 0
        chunk_size = self.cfg.dataset.chunk_size
        num_chunks = -(-num_samples // chunk_size) if num_samples else 0
        chunk_lo, chunk_hi = chunk_range_for_writer(
            num_chunks, num_writers, writer_id
        )
        owned_samples = max(
            0,
            min(chunk_hi * chunk_size, num_samples) - chunk_lo * chunk_size,
        )
        fingerprint = self._fingerprint()
        mpath = self._manifest_path(split, writer_id, num_writers)
        manifest = {
            "split": split,
            "total": num_samples,
            "completed": 0,
            "chunk_size": chunk_size,
            "files": [],
            "samples_per_second": 0.0,
            "seed": self.cfg.seed,
            "format": self.cfg.dataset.save_format,
            "fingerprint": fingerprint,
            "writer_id": writer_id,
            "num_writers": num_writers,
            "chunk_range": [chunk_lo, chunk_hi],
            "owned_samples": owned_samples,
        }
        if resume and mpath.exists():
            prev = json.loads(mpath.read_text())
            if (
                prev.get("chunk_size") == chunk_size
                and prev.get("fingerprint") == fingerprint
            ):
                # Chunk i is reusable iff its fixed index range under the
                # previous total equals its range under the new total AND it
                # was fully written; keep the contiguous on-disk prefix of
                # reusable chunks in the owned range. A trailing chunk that
                # was partial under a different total is regenerated
                # (deterministic keys ⇒ the overlap is bit-identical),
                # never silently kept/overwritten.
                prev_total = prev.get("total", prev.get("completed", 0))
                prev_done = min(prev.get("completed", 0), prev_total)
                # prev 'completed' counted prev-owned samples; convert to a
                # global sample bound for the full-chunk check
                prev_lo = prev.get("chunk_range", [0, 0])[0]
                prev_bound = prev_lo * chunk_size + prev_done
                files: List[str] = []
                completed, i = 0, chunk_lo
                while i < chunk_hi:
                    prev_end = min((i + 1) * chunk_size, prev_total)
                    new_end = min((i + 1) * chunk_size, num_samples)
                    p = self._chunk_path(split, i)
                    if (
                        prev_end != new_end
                        or prev_end > prev_bound
                        or p.name not in prev.get("files", [])
                        or not p.exists()
                    ):
                        break
                    files.append(p.name)
                    completed = new_end - chunk_lo * chunk_size
                    i += 1
                manifest.update(
                    completed=completed,
                    files=files,
                    samples_per_second=prev.get("samples_per_second", 0.0),
                )
        # single writer owns the whole namespace: prune stale chunks beyond
        # a shrunk total too (ADVICE r1 #1); multi-writer prunes only its
        # own contiguous block so writers never race on each other's files
        prune_hi = None if num_writers == 1 else chunk_hi
        if manifest["completed"] >= owned_samples:
            manifest["completed"] = owned_samples
            mpath.write_text(json.dumps(manifest, indent=2))
            self._prune_stale_chunks(split, manifest, chunk_lo, prune_hi)
            return manifest

        t0 = time.perf_counter()
        done_this_session = 0
        start = chunk_lo * chunk_size + manifest["completed"]
        stop = min(chunk_hi * chunk_size, num_samples)
        while start < stop:
            end = min(start + chunk_size, stop)
            idxs = np.arange(start, end)
            arrays = self._run_chunk(split, idxs)
            cpath = self._chunk_path(split, start // chunk_size)
            _write_chunk(cpath, arrays, self.cfg.dataset.save_format)
            if cpath.name not in manifest["files"]:
                manifest["files"].append(cpath.name)
            done_this_session += len(idxs)
            manifest["completed"] = end - chunk_lo * chunk_size
            elapsed = time.perf_counter() - t0
            manifest["samples_per_second"] = done_this_session / max(elapsed, 1e-9)
            mpath.write_text(json.dumps(manifest, indent=2))
            log(
                f"[{split}"
                + (f" w{writer_id}/{num_writers}" if num_writers > 1 else "")
                + f"] {end}/{stop} "
                f"({manifest['samples_per_second']:.1f} samples/s)"
            )
            start = end
        self._prune_stale_chunks(split, manifest, chunk_lo, prune_hi)
        return manifest

    def write_global_manifest(self, split: str, num_writers: int) -> Dict:
        """Assemble the standard `{split}_manifest.json` from per-writer
        manifests after a multi-writer run. Validates that every writer
        finished with the same fingerprint/total; prunes chunk files not
        referenced by any writer. The result is read by `read_split`/
        `verify_dataset` exactly like a single-writer manifest."""
        parts = []
        for w in range(num_writers):
            p = self._manifest_path(split, w, num_writers)
            if not p.exists():
                raise FileNotFoundError(f"missing per-writer manifest: {p}")
            parts.append(json.loads(p.read_text()))
        fp = parts[0]["fingerprint"]
        total = parts[0]["total"]
        for m in parts:
            if m["fingerprint"] != fp or m["total"] != total:
                raise ValueError(
                    f"inconsistent per-writer manifests for split {split!r}"
                )
            if m["completed"] < m["owned_samples"]:
                raise ValueError(
                    f"writer {m['writer_id']} incomplete: "
                    f"{m['completed']}/{m['owned_samples']}"
                )
        files = [f for m in parts for f in m["files"]]
        manifest = {
            "split": split,
            "total": total,
            "completed": total,
            "chunk_size": parts[0]["chunk_size"],
            "files": sorted(files),
            "samples_per_second": sum(m["samples_per_second"] for m in parts),
            "seed": parts[0]["seed"],
            "format": parts[0]["format"],
            "fingerprint": fp,
            "num_writers": num_writers,
        }
        self._manifest_path(split).write_text(json.dumps(manifest, indent=2))
        self._prune_stale_chunks(split, manifest)
        return manifest

    def _prune_stale_chunks(
        self,
        split: str,
        manifest: Dict,
        chunk_lo: int = 0,
        chunk_hi: Optional[int] = None,
    ) -> None:
        """Delete this split's chunk files in [chunk_lo, chunk_hi) that are
        no longer referenced by the manifest (left behind when a resume
        shrank ``num_samples``). Multi-writer runs prune only their owned
        range so writers never race on each other's files."""
        keep = set(manifest["files"])
        for p in self.out.glob(f"{split}_chunk_*.*"):
            try:
                idx = int(p.name.split("_chunk_")[1].split(".")[0])
            except (IndexError, ValueError):
                continue
            if chunk_hi is not None and not (chunk_lo <= idx < chunk_hi):
                continue
            if p.name not in keep:
                p.unlink()

    def merge_split(self, split: str) -> str:
        """Concatenate chunk files into one `{split}.npz`/`.h5`
        (reference run_phase3_robust.py:261-288)."""
        arrays = read_split(str(self._manifest_path(split)))
        out = self.out / f"{split}.{self._ext()}"
        _write_chunk(out, arrays, self.cfg.dataset.save_format)
        return str(out)
