"""Unit tests for the single-measurement min-size donor-chain merge
(`pyimsegm_tpu.ops.grid.donor_chain_table` / `min_size_merge`) — the code
path the default pipeline always runs (connectivity=True), covering chain
termination, ties, the 2**n_hops chain bound, and the extent-gated
all-or-nothing merge that keeps kept labels 4-connected."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyimsegm_tpu.ops import grid as grid_ops
from pyimsegm_tpu.ops import slic as slic_ops


def _ch(dy, dx):
    """Channel index of relative grid offset (dy, dx) in the 5x5 layout."""
    return (dy + 2) * 5 + (dx + 2)


def _row_tables(counts, contacts, gw):
    """Build (counts, sym25, counts9-with-own-tile-pixels) for a 1-row grid.

    :param contacts: {(a, b): n} symmetric contact counts between cells
    """
    counts = np.asarray(counts, np.float32)
    sym25 = np.zeros((1, gw, 25), np.float32)
    for (a, b), n in contacts.items():
        sym25[0, a, _ch(0, b - a)] += n
        sym25[0, b, _ch(0, a - b)] += n
    counts9 = np.zeros((1, gw, 9), np.float32)
    counts9[0, :, 4] = counts          # all pixels in the label's own tile
    return jnp.asarray(counts), jnp.asarray(sym25), jnp.asarray(counts9)


def test_chain_blocked_when_terminal_outside_source_extent():
    # A(small) touches only B(small); B touches X(kept).  X is 2 grid cells
    # from A's pixel tiles, so merging A into X would detach X's new pixels
    # from X — the all-or-nothing gate must suppress A's merge, while B's
    # (adjacent to X) fires.
    counts, sym25, counts9 = _row_tables(
        [5, 10, 1000, 1000], {(0, 1): 3, (1, 2): 4, (2, 3): 2}, 4)
    d = np.asarray(grid_ops.donor_chain_table(
        counts, sym25, 1, 4, min_size=50, counts9=counts9))
    assert d[1] == 2                     # B -> X fires
    assert d[0] == 0                     # A blocked (terminal 2 cells away)
    assert d[2] == 2 and d[3] == 3       # kept labels untouched

    # ungated table (no counts9): the old partial-merge hazard fires A -> X
    d_old = np.asarray(grid_ops.donor_chain_table(
        counts, sym25, 1, 4, min_size=50))
    assert d_old[0] == 2


def test_chain_fires_when_extent_adjacent_to_terminal():
    # same topology, but A's pixels all sit in tile 1 (offset oa=3 encodes
    # label cell = tile - (0, 1)), adjacent to X's cell -> chain fires fully
    counts, sym25, counts9 = _row_tables(
        [5, 10, 1000, 1000], {(0, 1): 3, (1, 2): 4, (2, 3): 2}, 4)
    counts9 = np.asarray(counts9).copy()
    counts9[0, 0, 4] = 0.0
    counts9[0, 1, 3] = 5.0               # A's pixels live in tile 1
    d = np.asarray(grid_ops.donor_chain_table(
        counts, sym25, 1, 4, min_size=50, counts9=jnp.asarray(counts9)))
    assert d[0] == 2 and d[1] == 2


def test_equal_count_tie_is_acyclic():
    # two small labels with equal counts and mutual contact: the
    # (count, -index) order lets only the higher-index one point at the
    # lower, so no 2-cycle; neither reaches a kept label -> both stay
    counts, sym25, counts9 = _row_tables(
        [5, 5, 1000, 1000], {(0, 1): 3}, 4)
    d = np.asarray(grid_ops.donor_chain_table(
        counts, sym25, 1, 4, min_size=50, counts9=counts9))
    assert d[0] == 0 and d[1] == 1


def test_long_chain_respects_hop_bound_and_terminates_on_kept():
    # a 10-link all-small chain with increasing counts feeding a kept tail:
    # every fired merge must terminate on a kept label; sources whose pixel
    # tiles are further than 1 cell from the terminal are suppressed
    gw = 12
    counts = list(range(5, 55, 5)) + [1000, 1000]
    contacts = {(i, i + 1): i + 1 for i in range(11)}
    counts_j, sym25, counts9 = _row_tables(counts, contacts, gw)
    d = np.asarray(grid_ops.donor_chain_table(
        counts_j, sym25, 1, gw, min_size=100, counts9=counts9, n_hops=3))
    small = np.asarray(counts) < 100
    for i in range(gw):
        if d[i] != i:
            assert not small[d[i]]                  # terminates on kept
            assert abs(d[i] - i) <= 1               # extent-gated
    assert d[9] == 10                               # adjacent link fires
    assert all(d[i] == i for i in range(9))         # distant links stay


def _assert_single_components(labels):
    """Every label's pixels form one 4-connected component (numpy flood)."""
    labels = np.asarray(labels)
    for lab in np.unique(labels):
        mask = labels == lab
        seed = np.zeros_like(mask)
        ys, xs = np.nonzero(mask)
        seed[ys[0], xs[0]] = True
        while True:
            grown = seed.copy()
            grown[1:] |= seed[:-1]
            grown[:-1] |= seed[1:]
            grown[:, 1:] |= seed[:, :-1]
            grown[:, :-1] |= seed[:, 1:]
            grown &= mask
            if (grown == seed).all():
                break
            seed = grown
        assert seed.sum() == mask.sum(), \
            'label %d split into multiple components' % lab


@pytest.mark.slow
def test_min_size_merge_preserves_single_connectivity():
    # real SLIC labels on a structured image -> enforce + min-size merge
    # must leave every surviving superpixel a single 4-connected region
    rng = np.random.default_rng(3)
    h, w, sp = 96, 128, 12
    yy, xx = np.mgrid[:h, :w]
    img = np.stack([np.sin(yy / 9.0) + rng.normal(0, 0.35, (h, w)),
                    np.cos(xx / 7.0) + rng.normal(0, 0.35, (h, w)),
                    ((yy + xx) % 23 < 8).astype(float)], -1).astype(np.float32)
    cfg = slic_ops.slic_config(h, w, sp)
    m = slic_ops.compactness_from_regul(sp, 0.2)
    labels = slic_ops.slic_segment(jnp.asarray(img), cfg, m)
    out = grid_ops.enforce_grid_connectivity(
        labels, cfg, min_size=int(0.5 * cfg.step * cfg.step))
    _assert_single_components(out)
