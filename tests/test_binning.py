import numpy as np
import jax.numpy as jnp

from tinysplat_tpu.ops.binning import bin_splats


def brute_force_lists(xys, depths, radii, valid, tiles_x, tiles_y, tile_size):
    """Reference binning: per tile, depth-sorted splat ids (numpy loops)."""
    lists = [[] for _ in range(tiles_x * tiles_y)]
    order = np.argsort(depths, kind="stable")
    for i in order:
        if not valid[i] or radii[i] <= 0:
            continue
        r = radii[i]
        bx0 = int(np.clip((xys[i, 0] - r) // tile_size, 0, tiles_x))
        bx1 = int(np.clip((xys[i, 0] + r) // tile_size + 1, 0, tiles_x))
        by0 = int(np.clip((xys[i, 1] - r) // tile_size, 0, tiles_y))
        by1 = int(np.clip((xys[i, 1] + r) // tile_size + 1, 0, tiles_y))
        for ty in range(by0, by1):
            for tx in range(bx0, bx1):
                lists[ty * tiles_x + tx].append(i)
    return lists


def random_case(n=80, tiles_x=4, tiles_y=3, tile_size=16, seed=0):
    rng = np.random.default_rng(seed)
    W, H = tiles_x * tile_size, tiles_y * tile_size
    xys = rng.uniform([-10, -10], [W + 10, H + 10], size=(n, 2)).astype(np.float32)
    depths = rng.uniform(0.5, 5.0, size=(n,)).astype(np.float32)
    radii = rng.integers(0, 25, size=(n,)).astype(np.int32)
    valid = rng.uniform(size=(n,)) > 0.15
    return xys, depths, radii, valid, tiles_x, tiles_y, tile_size


def test_bins_match_brute_force():
    case = random_case()
    expect = brute_force_lists(*case)
    xys, depths, radii, valid, tx, ty, ts = case
    bins = bin_splats(jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
                      jnp.asarray(valid), tx, ty, ts)
    got = np.asarray(bins.idx_lists)
    counts = np.asarray(bins.counts)
    for t in range(tx * ty):
        assert counts[t] == len(expect[t]), t
        np.testing.assert_array_equal(got[t, : counts[t]], expect[t])
        assert (got[t, counts[t]:] == -1).all()
    assert int(bins.dup_overflow) == 0
    assert int(bins.tile_overflow) == 0
    assert int(bins.total_intersections) == sum(len(l) for l in expect)


def test_tile_overflow_keeps_nearest():
    """When a tile overflows max_per_tile, the nearest splats are kept."""
    n = 40
    xys = np.full((n, 2), 8.0, np.float32)  # all in tile 0
    depths = np.arange(n, dtype=np.float32) + 1.0
    radii = np.full(n, 2, np.int32)
    valid = np.ones(n, bool)
    bins = bin_splats(jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
                      jnp.asarray(valid), 1, 1, 16, max_per_tile=16)
    assert int(bins.counts[0]) == 16
    np.testing.assert_array_equal(np.asarray(bins.idx_lists[0]), np.arange(16))
    assert int(bins.tile_overflow) == n - 16


def test_dup_overflow_reported():
    xys = np.full((4, 2), 8.0, np.float32)
    depths = np.ones(4, np.float32)
    radii = np.full(4, 100, np.int32)  # each covers the whole 4x4 grid
    bins = bin_splats(jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
                      jnp.ones(4, bool), 4, 4, 16, dup_capacity=32)
    assert int(bins.total_intersections) == 64
    assert int(bins.dup_overflow) == 32


def test_dense_bins_layout():
    """DenseBins: the sort output IS the layout — segments match TileBins."""
    import jax.numpy as jnp
    from tinysplat_tpu.ops.binning import bin_splats, bin_splats_dense

    rng = np.random.default_rng(5)
    n, H, W, ts = 60, 64, 96, 16
    tiles_x, tiles_y = W // ts, H // ts
    xys = jnp.asarray(rng.uniform(-8, [W + 8, H + 8], (n, 2)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 5.0, n).astype(np.float32))
    radii = jnp.asarray(rng.integers(1, 20, n).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=n) > 0.2)

    tb = bin_splats(xys, depths, radii, valid, tiles_x, tiles_y, ts)
    db = bin_splats_dense(xys, depths, radii, valid, tiles_x, tiles_y, ts,
                          chunk=8)
    assert int(db.total_intersections) == int(tb.total_intersections)
    order = np.asarray(db.order)
    ranks = np.asarray(db.entry_rank)
    starts = np.asarray(db.tile_starts)
    counts = np.asarray(db.counts)
    # Every tile's dense segment holds exactly the TileBins list (converted
    # from depth ranks to splat ids), in the same front-to-back order.
    for t in range(tiles_x * tiles_y):
        seg = ranks[starts[t] : starts[t] + counts[t]]
        assert (seg >= 0).all()
        ids = order[seg]
        expect = np.asarray(tb.idx_lists[t][: int(tb.counts[t])])
        np.testing.assert_array_equal(ids, expect)
    # Pads everywhere else past the used range.
    used = int(db.num_entries)
    assert (ranks[used:] == -1).all()


def test_span_start_fallback_matches_packed(monkeypatch):
    """The >=2^24 span-capacity fallback (exact int32 span-start gather
    instead of the packed-f32 column) produces identical bins. The real
    trigger needs 16M spans; lowering the module limit exercises the same
    code path at test scale (round-3 verdict weak item 6)."""
    import tinysplat_tpu.ops.binning as binning

    case = random_case(n=120, seed=3)
    xys, depths, radii, valid, tx, ty, ts = case
    args = (jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
            jnp.asarray(valid), tx, ty, ts)

    base = bin_splats(*args)
    monkeypatch.setattr(binning, "SPAN_START_PACK_LIMIT", 1)
    fall = bin_splats(*args)

    np.testing.assert_array_equal(np.asarray(base.idx_lists),
                                  np.asarray(fall.idx_lists))
    np.testing.assert_array_equal(np.asarray(base.counts),
                                  np.asarray(fall.counts))
    assert int(fall.dup_overflow) == 0 and int(fall.tile_overflow) == 0
