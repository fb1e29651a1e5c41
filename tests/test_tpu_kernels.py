"""TPU-gated kernel tests (VERDICT r1 item 6): run the Pallas mel kernels
NON-interpreted on the real chip and pin (a) exact-mode agreement with the
XLA matmul parity path, (b) the bf16 mode's documented ~6e-2 standardized-dB
error bound, (c) dense-kernel agreement, (d) end-to-end decision equivalence
of the pallas-exact pipeline vs the matmul pipeline.

The suite's conftest forces the CPU platform process-wide (needed for the
8-virtual-device mesh), so these tests execute their checks in a clean
subprocess where the axon TPU plugin is the default. They skip cleanly when
ANURAXLA_TPU_TESTS != 1 (CI/CPU) and self-skip if the subprocess finds no
TPU device.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ANURAXLA_TPU_TESTS") != "1",
    reason="TPU kernel tests opt-in via ANURAXLA_TPU_TESTS=1 (real chip, slow compile)",
)

_SCRIPT = r"""
import sys
import numpy as np
import jax, jax.numpy as jnp

if not any(d.platform == "tpu" for d in jax.devices()):
    print("NO_TPU")
    sys.exit(0)

from anuraxla.constants import DEFAULT_MEL
from anuraxla.detect.radial import radial_decide
from anuraxla.models.vae import VAEConfig, init_encoder
from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input
from anuraxla.ops.pallas_frontend import mel_power_pallas

cfg = DEFAULT_MEL
rng = np.random.default_rng(0)
B = 16
y = jnp.asarray((0.1 * rng.standard_normal((B, cfg.num_samples))).astype(np.float32))

# the platform-name assumption behind the CPU fallback must hold on the
# real chip: a wrong default_backend() string would silently demote every
# production 'pallas' session to the matmul path
from anuraxla.ops.frontend import resolved_backend
rb = resolved_backend(cfg, "pallas")
assert rb == "pallas", f"resolved_backend fell back ({rb}) on {jax.default_backend()}"

# full frontend (dB + standardize + crop), standardized units
ref = np.asarray(log_mel_batch(y, cfg, parity=True, backend="matmul"))

got_exact = np.asarray(log_mel_batch(y, cfg, parity=True, backend="pallas"))
err_exact = np.abs(got_exact - ref).max()
assert err_exact < 1e-3, f"pallas-ct exact vs matmul: {err_exact}"

# bf16 mode: documented ~6e-2 standardized-dB bound
T = cfg.total_frames
import anuraxla.ops.pallas_frontend as pf
from anuraxla.ops.mel import power_to_db, standardize, crop_or_pad_time
S = pf.mel_power_pallas(y, cfg, num_frames=T, exact=False)
got_bf16 = np.asarray(crop_or_pad_time(standardize(power_to_db(S, amin=cfg.amin, top_db=cfg.top_db)), cfg.target_frames))
err_bf16 = np.abs(got_bf16 - ref).max()
assert err_bf16 < 6.5e-2, f"pallas-ct bf16 vs matmul: {err_bf16}"

# assembly variants: the phase-transposed (default for hop%128==0) and
# stack frame-assembly paths must agree on the chip (real Mosaic lowering
# of the sub-8-sublane value slices — measured bitwise-identical at adoption)
S_ph = np.asarray(pf.mel_power_pallas(y, cfg, num_frames=T, exact=True, assembly="phase"))
S_st = np.asarray(pf.mel_power_pallas(y, cfg, num_frames=T, exact=True, assembly="stack"))
err_asm = np.abs(S_ph - S_st).max() / np.abs(S_st).max()
assert err_asm < 1e-5, f"phase vs stack assembly: {err_asm}"

# fused RMS scale: the SMEM per-row gain + in-VMEM scale/clip (phase
# kernel) must equal normalize-then-mel on the real chip, including the
# silence-gate sentinel row
from anuraxla.ops.frontend import rms_normalize_batch, rms_scale_batch
y_raw = (y * 0.3).at[1].multiply(1e-4)
sc = rms_scale_batch(y_raw)
S_f = np.asarray(pf.mel_power_pallas(y_raw, cfg, num_frames=T, exact=True, rms_scale=sc))
S_n = np.asarray(pf.mel_power_pallas(rms_normalize_batch(y_raw)[0], cfg, num_frames=T, exact=True))
err_sc = np.abs(S_f - S_n).max() / np.abs(S_n).max()
assert err_sc < 1e-5, f"fused rms_scale vs normalize-then-mel: {err_sc}"

# pre-padded host layout: bitwise the device-padded run on the chip
L_pad, pad_l = pf.phase_padded_layout(cfg, T)
y_pp = jnp.zeros((B, L_pad), jnp.float32).at[:, pad_l : pad_l + cfg.num_samples].set(y)
S_pp = np.asarray(pf.mel_power_pallas(y_pp, cfg, num_frames=T, exact=True, pre_padded=True))
S_dev = np.asarray(pf.mel_power_pallas(y, cfg, num_frames=T, exact=True))
assert np.array_equal(S_pp, S_dev), "pre_padded vs device-padded mismatch"

# dense kernel exact
S = pf.mel_power_pallas(y, cfg, num_frames=T, algorithm="dense")
got_dense = np.asarray(crop_or_pad_time(standardize(power_to_db(S, amin=cfg.amin, top_db=cfg.top_db)), cfg.target_frames))
err_dense = np.abs(got_dense - ref).max()
assert err_dense < 1e-3, f"pallas-dense vs matmul: {err_dense}"

# end-to-end decisions: pallas-exact pipeline == matmul pipeline
vcfg = VAEConfig()
enc, params = init_encoder(vcfg, seed=0)
rk = np.random.default_rng(1)
cent = jnp.asarray(rk.standard_normal((4, vcfg.latent_dim)), jnp.float32)
thr = jnp.asarray(np.full(4, 3.0), jnp.float32)
ranks = jnp.asarray(np.arange(4), jnp.float32)

def decide(backend):
    mels = log_mel_batch(y, cfg, parity=True, backend=backend)
    z = enc.apply(params, mel_to_encoder_input(mels))["mu"]
    return radial_decide(z, cent, thr, ranks)

d1, w1, b1 = (np.asarray(v) for v in decide("matmul"))
d2, w2, b2 = (np.asarray(v) for v in decide("pallas"))
assert (d1 == d2).all() and (w1 == w2).all(), "decision mismatch"
assert np.abs(b1 - b2).max() < 1e-2, f"best-distance drift {np.abs(b1 - b2).max()}"

print(f"OK exact={err_exact:.2e} bf16={err_bf16:.2e} dense={err_dense:.2e}")
"""


def test_pallas_kernels_on_tpu():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=1140,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    out = r.stdout.strip().splitlines()
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr[-2000:]}"
    if out and out[-1] == "NO_TPU":
        pytest.skip("no TPU device in subprocess")
    assert out and out[-1].startswith("OK"), r.stdout


_QUANT_SCRIPT = r"""
import sys
import numpy as np
import jax, jax.numpy as jnp

if not any(d.platform == "tpu" for d in jax.devices()):
    print("NO_TPU")
    sys.exit(0)

from anuraxla.constants import DEFAULT_MEL
from anuraxla.models.vae import VAEConfig, init_encoder
from anuraxla.models.quant import encoder_apply_quantized, quantize_encoder
from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input

# int8 serving must COMPILE and run natively on the chip (lax.conv on int8
# operands — the thing the CPU suite can't pin) and track the f32 encoder.
cfg = DEFAULT_MEL
rng = np.random.default_rng(0)
y = jnp.asarray((0.1 * rng.standard_normal((16, cfg.num_samples))).astype(np.float32))
x = mel_to_encoder_input(log_mel_batch(y, cfg, parity=True, backend="matmul"))

vcfg = VAEConfig()
enc, params = init_encoder(vcfg, seed=0)
qp = quantize_encoder(params, vcfg, x[:8])
mu_f = np.asarray(jax.jit(lambda v: enc.apply(params, v)["mu"])(x))
mu_q = np.asarray(jax.jit(lambda v: encoder_apply_quantized(qp, vcfg, v)["mu"])(x))
scale = np.abs(mu_f).max() + 1e-12
rel = np.abs(mu_q - mu_f).max() / scale
# PTQ on an untrained net with real mel stats: loose but meaningful bound
assert rel < 0.25, f"int8 latent drift {rel}"
print(f"OK int8 rel={rel:.3f}")
"""


def test_quantized_serving_on_tpu():
    r = subprocess.run(
        [sys.executable, "-c", _QUANT_SCRIPT],
        capture_output=True, text=True, timeout=1140,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    out = r.stdout.strip().splitlines()
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr[-2000:]}"
    if out and out[-1] == "NO_TPU":
        pytest.skip("no TPU device in subprocess")
    assert out and out[-1].startswith("OK"), r.stdout
