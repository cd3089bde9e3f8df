"""Driver-contract tests: entry() compiles, dryrun_multichip runs on the
virtual 8-device CPU mesh, bench's forward path is jittable."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 2, 32000)


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_overlap_add_with_fast_forward():
    from sudo_rm_rf_tpu import models
    from sudo_rm_rf_tpu.inference import OverlapAddSeparator
    from sudo_rm_rf_tpu.models.fast_inference import improved_forward_fast

    hp = dict(out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
              enc_kernel_size=21, enc_num_basis=16, num_sources=2)
    model = models.SuDORMRFImproved(**hp)
    params = model.init(jax.random.key(0), jnp.zeros((1, 1, 640)))["params"]
    sep = OverlapAddSeparator(
        model, params, chunk_samples=640, num_sources=2, batch_chunks=2,
        forward_fn=lambda p, v: improved_forward_fast(
            p, v, num_blocks=1, upsampling_depth=2, enc_kernel_size=21,
            num_sources=2, impl="fma",
        ),
    )
    mixture = np.random.default_rng(0).standard_normal(2000).astype(np.float32)
    est = sep.separate(mixture)
    assert est.shape == (2, 2000) and np.isfinite(est).all()

    # fma fast path agrees with the plain model through the separator
    sep2 = OverlapAddSeparator(
        model, params, chunk_samples=640, num_sources=2, batch_chunks=2
    )
    est2 = sep2.separate(mixture)
    np.testing.assert_allclose(est, est2, rtol=1e-3, atol=1e-4)
