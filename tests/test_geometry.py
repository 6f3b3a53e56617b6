import jax
import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.geometry.camera import compute_xyz, compute_xyz_np
from implicit_depth_tpu.geometry.normals import image_gradients, surface_normals
from implicit_depth_tpu.geometry.rays import ray_dir_map
from implicit_depth_tpu.geometry.sampling import (
    sample_masked_window,
    sample_valid_stratified,
)
from implicit_depth_tpu.geometry.voxel import make_voxel_grid, voxelize_points


def test_grid_layout_matches_reference():
    g = make_voxel_grid(res=8)
    assert g.part_size == 0.25
    assert g.dims == (9, 9, 9)
    np.testing.assert_allclose(g.xmin0, [-1.125, -1.125, -0.125])


def test_compute_xyz_roundtrip(rng):
    depth = rng.uniform(0.5, 2.0, size=(24, 32)).astype(np.float32)
    fx, fy, cx, cy = 30.0, 28.0, 16.0, 12.0
    xyz = compute_xyz_np(depth, fx, fy, cx, cy)
    assert xyz.shape == (24, 32, 3)
    np.testing.assert_allclose(xyz[..., 2], depth)
    # reproject: u = x*fx/z + cx
    u = xyz[..., 0] * fx / xyz[..., 2] + cx
    np.testing.assert_allclose(u, np.broadcast_to(np.arange(32), (24, 32)), atol=1e-4)
    xyz_j = compute_xyz(jnp.asarray(depth), fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(xyz_j), xyz, atol=1e-5)


def test_ray_dirs_unit_and_through_pixels():
    h, w, fx, fy, cx, cy = 24, 32, 30.0, 28.0, 16.0, 12.0
    d = np.asarray(ray_dir_map(h, w, fx, fy, cx, cy))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # a point along the ray of pixel (u,v) must reproject to (u,v)
    p = d * 1.7
    u = p[..., 0] * fx / p[..., 2] + cx
    v = p[..., 1] * fy / p[..., 2] + cy
    np.testing.assert_allclose(u, np.broadcast_to(np.arange(w), (h, w)), atol=1e-3)
    np.testing.assert_allclose(v, np.broadcast_to(np.arange(h)[:, None], (h, w)), atol=1e-3)


def test_voxelize_properties(rng):
    g = make_voxel_grid(res=8)
    pts = rng.uniform(-1.3, 1.3, size=(2, 500, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-0.3, 2.3, size=(2, 500)).astype(np.float32)
    mask = rng.uniform(size=(2, 500)) > 0.1
    out = voxelize_points(g, jnp.asarray(pts), jnp.asarray(mask))
    occ = np.asarray(out["occupancy"])
    valid = np.asarray(out["valid"])
    cell = np.asarray(out["cell_id"])
    rel = np.asarray(out["rel_coord"])

    # every valid point's cell is occupied, and occupancy is exactly the set
    # of valid-point cells
    expect = np.zeros_like(occ)
    for b in range(2):
        expect[b, cell[b][valid[b]]] = True
    np.testing.assert_array_equal(occ, expect)
    # rel coords within half a voxel for valid points
    assert np.all(np.abs(rel[valid]) <= g.part_size / 2 + 1e-6)
    # out-of-bound points are invalid
    oob = (pts[..., 0] < g.xmin0[0]) | (pts[..., 2] > g.xmin0[2] + g.dims[2] * g.part_size)
    assert not np.any(valid & oob)


def test_sample_masked_window_semantics(rng):
    mask = np.zeros((3, 100), bool)
    mask[0, 10:90] = True   # 80 > 32 -> contiguous window
    mask[1, 5:15] = True    # 10 < 32 -> all + padding
    # image 2: empty -> all slots invalid
    idx, slot, cnt, start = sample_masked_window(jnp.asarray(mask), 32,
                                                 jax.random.key(0))
    idx, slot, cnt, start = map(np.asarray, (idx, slot, cnt, start))
    assert cnt.tolist() == [80, 10, 0]
    # slot j holds the (start+j)-th True entry (rank/window contract used by
    # models/lidf.compose_pred_image)
    ranks = np.cumsum(mask[0]) - 1
    assert np.array_equal(ranks[idx[0]], start[0] + np.arange(32))
    assert slot[0].all()
    # contiguity: window indices are consecutive mask positions
    assert np.array_equal(idx[0], np.arange(idx[0][0], idx[0][0] + 32))
    assert mask[0, idx[0]].all()
    assert slot[1].sum() == 10 and mask[1, idx[1][:10]].all()
    assert not slot[2].any()


def test_sample_valid_stratified(rng):
    h, w, n = 32, 32, 64
    mask = rng.uniform(size=(2, h, w)) > 0.5
    mask[1] = False
    mask[1, 0, :24] = True  # 24 valid < n -> resample with repeats
    idx, slot, cnt = sample_valid_stratified(jnp.asarray(mask), n, jax.random.key(1))
    idx, slot, cnt = map(np.asarray, (idx, slot, cnt))
    assert cnt.tolist() == [int(mask[0].sum()), 24]
    flat0 = mask[0].reshape(-1)
    assert flat0[idx[0]].all()          # all sampled pixels are valid
    assert slot[0].all()
    # image 1 has 24 valid -> all used at least once, repeats allowed
    flat1 = mask[1].reshape(-1)
    assert flat1[idx[1]].all()
    assert len(set(idx[1].tolist())) == 24


def test_surface_normals_plane():
    # plane z = 1: dx ~ (d,0,0), dy ~ (0,d,0) -> normal (0,0,1) up to sign
    h, w = 8, 8
    u, v = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    pcl = np.stack([u * 0.1, v * 0.1, np.ones_like(u)], -1)[None]
    n, dx, dy = surface_normals(jnp.asarray(pcl))
    n = np.asarray(n)
    np.testing.assert_allclose(np.abs(n[0, :-1, :-1, 2]), 1.0, atol=1e-5)
    # last column/row of gradients are zero (tf.image_gradients convention)
    assert np.all(np.asarray(dx)[0, :, -1, :] == 0)
    assert np.all(np.asarray(dy)[0, -1, :, :] == 0)
