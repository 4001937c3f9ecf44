"""Parity tests for the opt-in lane-major patch decoder
(ops/pallas/lane_decoder.py) against the XLA decoder path, in Pallas
interpret mode on CPU.  Covers both production patch geometries,
including NTU's odd/irregular pyramid (9,3 -> 18,6 -> 37,12 -> 75,25).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.models.rcnet import MultiScaleDecoder
from riders_tpu.ops.pallas import lane_decoder as LD


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.slow
@pytest.mark.parametrize("patch,skips_hw", [
    ((240, 100), [(120, 50), (60, 25), (30, 12), (15, 6)]),   # ZJU
    ((150, 50), [(75, 25), (37, 12), (18, 6), (9, 3)]),       # NTU
])
def test_lane_decode_matches_xla_decoder(patch, skips_hw):
    N = 128
    lh, lw = patch[0] // 32, patch[1] // 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, lh, lw, 256), jnp.float32)
    skips = [jax.random.normal(jax.random.PRNGKey(i + 1), (N, h, w, c),
                               jnp.float32)
             for i, ((h, w), c) in enumerate(
                 zip(skips_hw, [32, 64, 128, 128]))]
    dec = MultiScaleDecoder((256, 128, 64, 32, 16), patch, 1, "leaky_relu",
                            True, dtype=jnp.bfloat16, phase_tail=False)
    variables = dec.init(jax.random.PRNGKey(42), x, skips)
    want = np.asarray(dec.apply(variables, x, skips), np.float32)

    lane = MultiScaleDecoder((256, 128, 64, 32, 16), patch, 1,
                             "leaky_relu", True, dtype=jnp.bfloat16,
                             lane_mode="full")
    got = np.asarray(lane.apply(variables, x, skips), np.float32)

    assert got.shape == want.shape
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.05, rel


def test_lane_conv3x3_two_inputs_and_borders():
    H, W, C1, C2, CO, N = 15, 6, 32, 48, 32, 128
    key = jax.random.PRNGKey(0)
    x1 = jax.random.normal(key, (N, H, W, C1), jnp.float32)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (N, H, W, C2),
                           jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, C1 + C2, CO),
                          jnp.float32) * 0.1
    sc = jnp.ones((CO,), jnp.float32)
    bi = jnp.zeros((CO,), jnp.float32)

    xin = jnp.concatenate(
        [x1.astype(jnp.bfloat16).astype(jnp.float32),
         x2.astype(jnp.bfloat16).astype(jnp.float32)], -1)
    want = jax.lax.conv_general_dilated(
        xin, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    want = np.asarray(jnp.where(want > 0, want, 0.2 * want), np.float32)

    got = LD.lane_conv3x3(
        [LD.to_lane(x1), LD.to_lane(x2)], [k[:, :, :C1], k[:, :, C1:]],
        sc, bi, 0.2, interpret=True)
    gz = np.asarray(got, np.float32)
    # zero borders written by the edge programs
    assert gz[0].max() == 0 and gz[-1].max() == 0
    assert gz[:, 0].max() == 0 and gz[:, -1].max() == 0
    got_i = np.transpose(gz[1:-1, 1:-1], (3, 0, 1, 2))
    rel = np.abs(got_i - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_nearest_resize_lane_matches_resize2d():
    from riders_tpu.ops.resize import resize2d
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (128, 12, 5, 16), jnp.float32)
    want = np.asarray(resize2d(x.astype(jnp.bfloat16), (25, 12),
                               "nearest"), np.float32)
    got = LD.nearest_resize_lane(LD.to_lane(x), (25, 12))
    got_i = np.transpose(np.asarray(got, np.float32)[1:-1, 1:-1],
                         (3, 0, 1, 2))
    np.testing.assert_allclose(got_i, want, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("patch,skips_hw", [
    ((240, 100), [(120, 50), (60, 25), (30, 12), (15, 6)]),   # ZJU
    ((150, 50), [(75, 25), (37, 12), (18, 6), (9, 3)]),       # NTU
])
def test_lane_tail_matches_xla_decoder(patch, skips_hw):
    """Hybrid decode (XLA deconv4..2 + lane-kernel deconv1/tail) parity."""
    N = 128
    lh, lw = patch[0] // 32, patch[1] // 32
    x = jax.random.normal(jax.random.PRNGKey(0), (N, lh, lw, 256),
                          jnp.float32)
    skips = [jax.random.normal(jax.random.PRNGKey(i + 1), (N, h, w, c),
                               jnp.float32)
             for i, ((h, w), c) in enumerate(
                 zip(skips_hw, [32, 64, 128, 128]))]
    dec = MultiScaleDecoder((256, 128, 64, 32, 16), patch, 1, "leaky_relu",
                            True, dtype=jnp.bfloat16, phase_tail=False)
    variables = dec.init(jax.random.PRNGKey(42), x, skips)
    want = np.asarray(dec.apply(variables, x, skips), np.float32)

    hyb = MultiScaleDecoder((256, 128, 64, 32, 16), patch, 1,
                            "leaky_relu", True, dtype=jnp.bfloat16,
                            lane_mode="tail", phase_tail=False)
    got = np.asarray(hyb.apply(variables, x, skips), np.float32)

    assert got.shape == want.shape
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.05, rel
