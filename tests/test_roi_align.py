import jax.numpy as jnp
import numpy as np

from implicit_depth_tpu.ops.roi_align import _bilinear, roi_align, roi_window_pool


def _roi_align_naive(feat, box, oh=2, ow=2, max_grid=4):
    """Straight-line numpy port of torchvision roi_align (aligned=True)."""
    h, w, c = feat.shape
    x1, y1, x2, y2 = box[0] - 0.5, box[1] - 0.5, box[2] - 0.5, box[3] - 0.5
    roi_w, roi_h = x2 - x1, y2 - y1
    bin_w, bin_h = roi_w / ow, roi_h / oh
    gw = int(np.clip(np.ceil(bin_w), 1, max_grid))
    gh = int(np.clip(np.ceil(bin_h), 1, max_grid))

    def sample(y, x):
        if y < -1 or y > h or x < -1 or x > w:
            return np.zeros(c)
        y, x = np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1_] * (1 - ly) * lx
                + feat[y1_, x0] * ly * (1 - lx) + feat[y1_, x1_] * ly * lx)

    out = np.zeros((oh, ow, c))
    for ph in range(oh):
        for pw in range(ow):
            acc = np.zeros(c)
            for iy in range(gh):
                for ix in range(gw):
                    y = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    x = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                    acc += sample(y, x)
            out[ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_matches_naive(rng):
    feat = rng.normal(size=(2, 24, 32, 3)).astype(np.float32)
    boxes, batches = [], []
    for px, py in [(16, 12), (3, 12), (16, 1), (31, 23), (0, 0), (10, 20)]:
        x1, y1 = np.clip(px - 4, 0, 31), np.clip(py - 4, 0, 23)
        x2, y2 = np.clip(px + 4, 0, 31), np.clip(py + 4, 0, 23)
        boxes.append([x1, y1, x2, y2])
        batches.append(len(batches) % 2)
    boxes = np.asarray(boxes, np.float32)
    batches = np.asarray(batches, np.int32)

    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                               jnp.asarray(batches)))
    for i in range(len(boxes)):
        want = _roi_align_naive(feat[batches[i]], boxes[i])
        np.testing.assert_allclose(got[i], want, atol=1e-4, err_msg=str(i))


def test_window_pool_equals_exact_for_interior(rng):
    feat = rng.normal(size=(1, 24, 32, 5)).astype(np.float32)
    pix = np.asarray([[16, 12], [5, 7], [27, 19]], np.int32)  # interior pixels
    bidx = np.zeros(3, np.int32)
    got = np.asarray(roi_window_pool(jnp.asarray(feat), jnp.asarray(pix),
                                     jnp.asarray(bidx)))
    boxes = np.concatenate([pix - 4, pix + 4], -1).astype(np.float32)
    want = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), jnp.asarray(bidx)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # and equals the plain 4x4 block mean
    px, py = 16, 12
    blk = feat[0, py - 4:py, px - 4:px].mean((0, 1))
    np.testing.assert_allclose(got[0, 0, 0], blk, atol=1e-5)


def test_window_pool_border_shifts_inside(rng):
    feat = rng.normal(size=(1, 24, 32, 2)).astype(np.float32)
    pix = np.asarray([[0, 0], [31, 23]], np.int32)
    got = np.asarray(roi_window_pool(jnp.asarray(feat), jnp.asarray(pix),
                                     jnp.asarray(np.zeros(2, np.int32))))
    # border pixels use the window shifted fully inside
    want0 = np.asarray(roi_window_pool(jnp.asarray(feat),
                                       jnp.asarray(np.asarray([[4, 4]], np.int32)),
                                       jnp.asarray(np.zeros(1, np.int32))))
    np.testing.assert_allclose(got[0], want0[0], atol=1e-5)
    assert np.isfinite(got).all()


def test_bilinear_outside_zero():
    feat = jnp.ones((4, 4, 1))
    v = _bilinear(feat, jnp.asarray([-2.0, 1.0]), jnp.asarray([1.0, 5.0]))
    np.testing.assert_allclose(np.asarray(v), [[0.0], [0.0]])
