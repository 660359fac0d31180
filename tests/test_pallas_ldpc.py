"""Pallas LDPC kernel: interpret-mode exactness vs the XLA decoder.

The fused VMEM-resident kernel (ops/pallas_ldpc.py) is a MEASURED REJECTION
on real hardware (VMEM overflow + in-kernel gather cost — see its module
docstring); these tests keep the rejection reproducible by pinning the
kernel's bits / ok flags / iteration counts against ops/ldpc.decode in
interpret mode, on the golden hard-decode vectors and on noisy waterfall
batches.  Reference decoder: src/fec/ldpc_decoder.cpp:151-236.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from projectultra_tpu.config import CodeRate
from projectultra_tpu.fec import ldpc
from projectultra_tpu.ops import ldpc as ldpc_ops
from projectultra_tpu.ops.pallas_ldpc import decode_pallas
from projectultra_tpu.utils.bits import bytes_to_bits

NAMES = {CodeRate.R1_4: "R1_4", CodeRate.R1_2: "R1_2", CodeRate.R2_3: "R2_3",
         CodeRate.R3_4: "R3_4", CodeRate.R5_6: "R5_6"}


def _golden(golden_dir, rate):
    out = {}
    with open(os.path.join(golden_dir, f"golden_ldpc_{NAMES[rate]}.txt")) as f:
        for line in f:
            toks = line.split()
            for k, v in zip(toks[::2], toks[1::2]):
                out[k] = v
    return out


@pytest.mark.parametrize("rate", [CodeRate.R1_2, CodeRate.R1_4, CodeRate.R5_6])
def test_interpret_matches_xla_on_golden(golden_dir, rate):
    """Hard-input (+-4 LLR) golden codewords: identical bits/ok/iters."""
    g = _golden(golden_dir, rate)
    code = ldpc.get_code(rate)
    coded_bits = bytes_to_bits(bytes.fromhex(g["coded"]))[:code.n]
    llr = jnp.asarray(4.0 * (1.0 - 2.0 * coded_bits.astype(np.float32)))[None]
    bits_x, ok_x, it_x = ldpc_ops.decode(code, llr)
    bits_p, ok_p, it_p = decode_pallas(code, llr, interpret=True)
    np.testing.assert_array_equal(np.asarray(bits_p), np.asarray(bits_x))
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
    np.testing.assert_array_equal(np.asarray(it_p), np.asarray(it_x))


@pytest.mark.parametrize("rate,sigma", [(CodeRate.R1_2, 0.62),
                                        (CodeRate.R1_4, 1.1)])
def test_interpret_matches_xla_under_noise(rate, sigma):
    """Noisy waterfall batch (multi-iteration lanes, some failures): the
    kernel must track the XLA decoder lane for lane."""
    code = ldpc.get_code(rate)
    rng = np.random.default_rng(1234)
    B = 24
    info = rng.integers(0, 2, size=(B, code.k)).astype(np.uint8)
    cw = np.stack([ldpc.encode_block_np(code, info[b]) for b in range(B)])
    y = (1.0 - 2.0 * cw.astype(np.float32)) \
        + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * y / (sigma * sigma))
    bits_x, ok_x, it_x = ldpc_ops.decode(code, llr)
    bits_p, ok_p, it_p = decode_pallas(code, llr, interpret=True)
    ok_x = np.asarray(ok_x)
    assert 0.0 < ok_x.mean() < 1.0  # operating point exercises both paths
    assert (np.asarray(it_x) > 0).any()  # and multi-iteration lanes
    np.testing.assert_array_equal(np.asarray(ok_p), ok_x)
    np.testing.assert_array_equal(np.asarray(it_p), np.asarray(it_x))
    np.testing.assert_array_equal(np.asarray(bits_p)[ok_x],
                                  np.asarray(bits_x)[ok_x])
