"""Limb-count bucketing (CkksConfig.limb_pad): padded towers must decrypt
to the same values as exact towers through deep op chains.

The bucketing contract (core/ckks.py Ciphertext docstring): rows
[limbs, bucket) hold residues of SOME value ≡ the ciphertext mod Q_l;
every kernel is residue-wise mod arithmetic, so any result sliced to the
logical limbs is exact.  These tests drive mult/rescale/rotate/plaintext
chains down many levels under limb_pad>1 and compare against the
limb_pad=1 evaluator bit-for-bit on the message (tolerances cover the
keyswitch-noise difference only).
"""

import numpy as np
import pytest

from sorting_fhe_tpu.core.ckks import CkksContext
from sorting_fhe_tpu.core.params import CkksConfig
from sorting_fhe_tpu.utils.testvec import vector_with_min_diff

RNG = np.random.default_rng(11)


def _ctx(pad: int, depth: int = 10) -> CkksContext:
    return CkksContext(CkksConfig(ring_dim=1 << 10, mult_depth=depth,
                                  scale_bits=52, comp=2, dnum=3,
                                  limb_pad=pad))


def _chain(ctx, v):
    """mult -> square -> rotate -> pt-mult -> scalar ladder descending the
    whole chain; returns the decrypted result."""
    ct = ctx.encrypt(v, slots=len(v))
    ctx.gen_rotation_keys([1, 2])
    want = v.copy()
    ct = ctx.mult(ct, ct)                     # v^2
    want = want * want
    ct = ctx.square(ct)                       # v^4
    want = want * want
    ct = ctx.rotate(ct, 1)
    want = np.roll(want, -1)
    pt = ctx.make_plaintext(np.full(len(v), 0.5), ct.limbs, ctx.delta,
                            ct.slots)
    ct = ctx.mult(ct, pt)                     # * 0.5
    want = want * 0.5
    ct = ctx.add(ct, 0.25)
    want = want + 0.25
    ct = ctx.mult_scalar(ct, 2.0)
    want = want * 2.0
    ct = ctx.sub(ct, ctx.rotate(ct, 2))
    want = want - np.roll(want, -2)
    # drive to the bottom of the chain so every bucket is exercised
    while ct.limbs - ctx.params.comp * 2 >= ctx.params.base_limbs + 2:
        ct = ctx.square(ct)
        want = np.clip(want * want, -1e12, 1e12)
        if np.abs(want).max() > 1e3:          # keep magnitudes sane
            ct = ctx.mult_scalar(ct, 1e-6)
            want = want * 1e-6
    return ctx.decrypt(ct)[: len(v)], want


@pytest.mark.parametrize("pad", [4, 8])
def test_bucketed_chain_matches_exact(pad):
    v = np.array([0.9, -0.5, 0.25, 0.8])
    got_pad, want = _chain(_ctx(pad), v)
    got_exact, _ = _chain(_ctx(1), v)
    assert np.abs(got_pad - want).max() < 1e-4, (got_pad, want)
    # padded and exact evaluators see identical messages (noise differs)
    assert np.abs(got_pad - got_exact).max() < 1e-5


def test_bucketed_physical_shapes():
    ctx = _ctx(4)
    v = np.array([0.5, 0.5])
    ct = ctx.encrypt(v, slots=2)
    nq = ctx.params.nq
    assert ct.data.shape[1] == nq and ct.limbs == nq
    ct = ctx.rescale(ctx.mult(ct, ct))
    assert ct.limbs == nq - 2
    assert ct.data.shape[1] == ctx.bucket_limbs(nq - 2)
    assert ct.data.shape[1] % 4 == 0 or ct.data.shape[1] == nq
    # one compiled table set per bucket, not per limb count
    l1, l2 = ct.limbs, ct.limbs - 2
    if ctx.bucket_limbs(l1) == ctx.bucket_limbs(l2):
        assert ctx.tables(l1) is ctx.tables(l2)


def test_bucketed_sign_compare():
    """A real primitive (composite sign) through the bucketed evaluator."""
    from sorting_fhe_tpu.ops.comparison import compare
    from sorting_fhe_tpu.ops.sign import (SignConfig, CompositeSignConfig,
                                          SignFunc)
    ctx = _ctx(8, depth=14)
    a = ctx.encrypt(np.array([0.7, 0.2, 0.65, 0.9]), slots=4)
    b = ctx.encrypt(np.array([0.3, 0.6, 0.45, 0.1]), slots=4)
    out = compare(ctx, a, b, SignFunc.CompositeSign,
                  SignConfig(CompositeSignConfig(3, 2, 2)))
    got = ctx.decrypt(out)[:4]
    assert np.abs(got - np.array([1.0, 0.0, 1.0, 1.0])).max() < 0.01


def test_bucketed_serialization_roundtrip(tmp_path):
    """Padded ciphertexts serialize at logical limbs and re-pad on load."""
    from sorting_fhe_tpu import serial
    ctx = _ctx(4)
    v = np.array([0.9, -0.5, 0.25, 0.8])
    ct = ctx.rescale(ctx.mult(ctx.encrypt(v, slots=4),
                              ctx.encrypt(v, slots=4)))
    p = tmp_path / "ct.npz"
    serial.save_ciphertext(p, ct)
    back = serial.load_ciphertext(p, ctx)
    assert back.limbs == ct.limbs
    assert back.data.shape == ct.data.shape
    assert np.abs(ctx.decrypt(back)[:4] - v * v).max() < 1e-5
