"""Full-Wiener (mmse_full) sidecar computation for generated splits.

Round-4 extension (no reference counterpart): precompute the conditional-
mean classical estimate per sample and store its first-antenna-pair slice
(S, K) complex64 as `H_wiener` sidecar chunks + a
`<split>_wiener_manifest.json`. ChannelDataset(wiener=True) joins them to
emit the 7-channel residual-on-Wiener training layout
(models/inputs.py apply_output_residual).
"""
from __future__ import annotations

import functools
import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


def compute_wiener_sidecar(
    cfg,
    manifest_path,
    batch_size: int = 64,
    log=print,
    estimator: str = "mmse_full",
    tag: str = "wiener",
) -> Optional[dict]:
    """Compute Wiener-estimate sidecars for one split manifest. Returns the
    sidecar manifest dict (also written next to the split manifest).

    ``estimator='mmse_full'`` (oracle priors, default) writes
    ``<split>_wiener_*``; ``estimator='mmse_full_est', tag='bwiener'``
    writes the BLIND-prior sidecars (``<split>_bwiener_*``) whose feature
    inherits no genie information (estimators/blind.py).
    """
    import jax

    from ..estimators.api import estimate_batch
    from ..eval.evaluate import _frames_from_arrays
    from ..physics.simulate import table_for
    from ..utils.host import get_numpy
    from .ce5g_format import write_ce5g
    from .generator import read_chunk

    mp = Path(manifest_path)
    manifest = json.loads(mp.read_text())
    split = manifest.get("split", mp.stem)
    table = table_for(cfg)
    fn = jax.jit(
        functools.partial(
            estimate_batch, cfg=cfg, estimator=estimator, table=table
        )
    )

    out_files = []
    t_split = time.time()
    n_done = 0
    for f in manifest["files"]:
        src = mp.parent / f
        dst = mp.parent / (
            f.replace("_chunk_", f"_{tag}_").rsplit(".", 1)[0] + ".ce5g"
        )
        arrays = read_chunk(src)
        n = len(arrays["rx_symbols"])
        n_sym, n_sc = arrays["pilot_mask"].shape[1:]
        out = np.empty((n, n_sym, n_sc), np.complex64)
        t0 = time.time()
        for start in range(0, n, batch_size):
            idx = np.arange(start, min(start + batch_size, n))
            if len(idx) < batch_size and n >= batch_size:
                idx = np.arange(n - batch_size, n)  # keep one compiled shape
            frames = _frames_from_arrays(arrays, idx, cfg)
            h = fn(frames)  # (B, S, R, T, K), identical along T
            out[idx] = get_numpy(h[:, :, 0, 0, :])
            n_done += len(idx)
        write_ce5g(dst, {"H_wiener": out})
        out_files.append(dst.name)
        log(f"{split}: {dst.name} ({n} samples, {time.time() - t0:.1f}s)")

    wm = {
        "split": split,
        "estimator": estimator,
        "files": out_files,
        "source_fingerprint": manifest.get("fingerprint"),
        "samples_per_second": n_done / max(time.time() - t_split, 1e-9),
    }
    (mp.parent / f"{split}_{tag}_manifest.json").write_text(
        json.dumps(wm, indent=2)
    )
    return wm
