"""Pilot pattern generation, fixed-shape and batchable.

Parity source: reference src/channel_simulator.py:206-260 — the reference
always draws *random scattered* pilots (shuffle all S·K resource elements,
keep the first ``int(total · density)``), regardless of the YAML 'pattern'
field. We reproduce that as the default and additionally provide real 'comb'
and 'block' patterns.

Fixed-shape contract (for jit/vmap over mixed densities): every pattern is
represented by
    mask:      (S, K) float32 — 1.0 at pilot REs;
    positions: (P_max, 2) int32 — (symbol, subcarrier) of each pilot slot;
    valid:     (P_max,) float32 — 1.0 for slots < num_pilots (rest padding).
``P_max = int(total · max_density)`` is static; ``num_pilots`` may be traced.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PilotPattern(NamedTuple):
    mask: jax.Array  # (S, K) float32
    positions: jax.Array  # (P_max, 2) int32, padded
    valid: jax.Array  # (P_max,) float32
    num_pilots: jax.Array  # () int32


def num_pilots_for(num_symbols: int, num_subcarriers: int, density) -> jax.Array:
    """int(total · density) — reference channel_simulator.py:223-224."""
    total = num_symbols * num_subcarriers
    return jnp.floor(total * jnp.asarray(density, jnp.float32)).astype(jnp.int32)


def scattered_pattern(
    key, num_symbols: int, num_subcarriers: int, density, max_density: float = 0.15
) -> PilotPattern:
    """Random scattered pilots (reference parity, channel_simulator.py:227-236)."""
    total = num_symbols * num_subcarriers
    p_max = int(total * max_density)
    n_pilots = num_pilots_for(num_symbols, num_subcarriers, density)

    # Exact-size uniform subset WITHOUT a full 8k-element sort (the
    # reference shuffles all REs and keeps the first n; a permutation is
    # an O(total·log²) bitonic sort on TPU and dominated frame setup).
    # Equivalent draw: keep the n smallest of iid uniforms — the selected
    # SET has the same exchangeable distribution. The n-th order statistic
    # is found by 25 rounds of branch-free threshold bisection (dense VPU
    # compares), then a cumsum ranks the survivors and drops ties past n.
    u = jax.random.uniform(key, (total,))

    def bisect(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        above = jnp.sum(u < mid) >= n_pilots
        return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 25, bisect, (jnp.float32(0.0), jnp.float32(1.0)))
    pre = u < hi
    rank = jnp.cumsum(pre) - 1  # selection rank by linear index
    sel = pre & (rank < n_pilots)
    mask = sel.reshape(num_symbols, num_subcarriers).astype(jnp.float32)

    # Compact selected linear indices into the fixed p_max slot table.
    slots = jnp.where(sel, rank, p_max).astype(jnp.int32)
    lin = (
        jnp.zeros(p_max + 1, jnp.int32)
        .at[slots]
        .set(jnp.arange(total, dtype=jnp.int32), mode="drop")[:p_max]
    )
    positions = jnp.stack(
        [lin // num_subcarriers, lin % num_subcarriers], axis=-1
    ).astype(jnp.int32)
    valid = (jnp.arange(p_max) < n_pilots).astype(jnp.float32)
    return PilotPattern(mask, positions, valid, n_pilots)


def comb_pattern(
    key, num_symbols: int, num_subcarriers: int, density, max_density: float = 0.15
) -> PilotPattern:
    """Comb pilots: every ``round(1/density_per_symbol)``-th subcarrier on
    every symbol, staggered by symbol index (standard LTE/NR CRS-like comb).
    Defined so the realized density ≈ requested density.
    """
    total = num_symbols * num_subcarriers
    p_max = int(total * max_density)
    n_pilots = num_pilots_for(num_symbols, num_subcarriers, density)
    per_sym = jnp.maximum(n_pilots // num_symbols, 1)
    step = jnp.maximum(num_subcarriers // per_sym, 1)

    s_idx = jnp.arange(num_symbols)[:, None]
    k_idx = jnp.arange(num_subcarriers)[None, :]
    offset = (s_idx * (step // 2)) % jnp.maximum(step, 1)
    mask = (((k_idx - offset) % step) == 0).astype(jnp.float32)

    flat_idx = jnp.argsort(-mask.reshape(-1), stable=True)[:p_max].astype(jnp.int32)
    count = jnp.minimum(jnp.sum(mask).astype(jnp.int32), p_max)
    positions = jnp.stack(
        [flat_idx // num_subcarriers, flat_idx % num_subcarriers], axis=-1
    )
    valid = (jnp.arange(p_max) < count).astype(jnp.float32)
    # Zero mask entries beyond P_max capacity so mask consumers (mmse_full)
    # and positions consumers (LS/diag-MMSE) always see the same pilot set.
    mask = (
        jnp.zeros(total, jnp.float32)
        .at[flat_idx]
        .max(valid)
        .reshape(num_symbols, num_subcarriers)
    )
    return PilotPattern(mask, positions, valid, count)


def block_pattern(
    key, num_symbols: int, num_subcarriers: int, density, max_density: float = 0.15
) -> PilotPattern:
    """Block pilots: whole pilot symbols spread uniformly in time."""
    total = num_symbols * num_subcarriers
    p_max = int(total * max_density)
    n_pilots = num_pilots_for(num_symbols, num_subcarriers, density)
    n_sym_pilot = jnp.clip(
        jnp.round(n_pilots / num_subcarriers).astype(jnp.int32), 1, num_symbols
    )
    # Uniformly spaced pilot symbol indices.
    s_idx = jnp.arange(num_symbols)
    stride = num_symbols / jnp.maximum(n_sym_pilot, 1)
    chosen = jnp.floor(jnp.arange(num_symbols) * 1.0 / jnp.maximum(stride, 1e-9)).astype(
        jnp.int32
    )
    is_pilot_sym = jnp.zeros(num_symbols, jnp.float32)
    sel = jnp.round(jnp.arange(num_symbols) * stride).astype(jnp.int32)
    take = (jnp.arange(num_symbols) < n_sym_pilot).astype(jnp.float32)
    is_pilot_sym = is_pilot_sym.at[jnp.clip(sel, 0, num_symbols - 1)].max(take)
    mask = jnp.broadcast_to(is_pilot_sym[:, None], (num_symbols, num_subcarriers))

    flat_idx = jnp.argsort(-mask.reshape(-1), stable=True)[:p_max].astype(jnp.int32)
    count = jnp.minimum(jnp.sum(mask).astype(jnp.int32), p_max)
    positions = jnp.stack(
        [flat_idx // num_subcarriers, flat_idx % num_subcarriers], axis=-1
    )
    valid = (jnp.arange(p_max) < count).astype(jnp.float32)
    # Cap the mask at P_max capacity (same contract as comb_pattern).
    mask = (
        jnp.zeros(total, jnp.float32)
        .at[flat_idx]
        .max(valid)
        .reshape(num_symbols, num_subcarriers)
    )
    return PilotPattern(mask, positions, valid, count)


_PATTERNS = {
    "scattered": scattered_pattern,
    "comb": comb_pattern,
    "block": block_pattern,
}


def make_pattern(
    key,
    num_symbols: int,
    num_subcarriers: int,
    density,
    pattern: str = "scattered",
    max_density: float = 0.15,
) -> PilotPattern:
    try:
        fn = _PATTERNS[pattern]
    except KeyError:
        raise ValueError(f"Unknown pilot pattern: {pattern!r}") from None
    # Pilot slots beyond P_max = total·max_density are silently dropped by
    # the fixed-shape contract; reject concrete out-of-range densities at
    # the API boundary (traced densities can't be checked here).
    if isinstance(density, (int, float)) and density > max_density:
        raise ValueError(
            f"pilot density {density} exceeds max_density {max_density}; "
            "raise max_density to keep the fixed-shape pilot slots exact"
        )
    return fn(key, num_symbols, num_subcarriers, density, max_density)


def insert_pilots(pattern: PilotPattern, data_symbols, pilot_symbols):
    """Fill a grid with pilots at mask positions and data elsewhere
    (reference channel_simulator.py:238-252). Fixed-shape variant: both
    inputs are full (S, K) grids; the mask selects between them."""
    return jnp.where(pattern.mask > 0, pilot_symbols, data_symbols)


def extract_pilots(pattern: PilotPattern, grid):
    """Extract pilot values into padded slots (reference :254-256):
    returns (P_max,) values in position order, zero at invalid slots."""
    sy, sc = pattern.positions[:, 0], pattern.positions[:, 1]
    return grid[..., sy, sc] * pattern.valid
