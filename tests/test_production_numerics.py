"""Production numerics path, asserted ON TPU (VERDICT r3 item 2, r4 item 6).

conftest pins ``jax_default_matmul_precision = "highest"`` suite-wide so the
f32 parity tests pass on the MXU — which means the SHIPPED configuration
(DEFAULT-precision bf16 warp/box-blur matmuls inside the Farneback flow, and
bf16 backbones) would never be exercised by an automated test.  This test
runs only on a TPU-attached host (CPU executes all matmuls in f64/f32 so
DEFAULT precision is not observable there) and asserts through
``relaxtpu.parity.production_numerics`` — the same surface ``parity --check
production`` and bench.py's per-round ``production_numerics`` artifact key
use — re-checking the figures measured by ``scripts/exp_box_prec.py`` /
``scripts/exp_warp_cfg.py`` and recorded in docs/MIGRATION.md with margin:

- flow vs cv2 at DEFAULT precision: mean interior error <= 5e-3 px
  (measured ~9.5e-4 px; the f32/HIGH parity bound elsewhere is 0.05 px —
  ref cv2 call: /root/reference/src/main_fragment_layerstack.py:313-315)
- bf16 backbones vs f32 over the full 35,203-dim vector: cosine >= 0.9999
  (measured 0.99998, docs/MIGRATION.md)
"""
import jax
import pytest


def _tpu_devices():
    try:
        return jax.devices("tpu")
    except RuntimeError:
        return []


requires_tpu = pytest.mark.skipif(
    not _tpu_devices(), reason="production-precision path is TPU-only"
)


@pytest.mark.slow
@requires_tpu
def test_production_numerics_on_chip():
    pytest.importorskip("cv2")
    from relaxtpu.parity import production_numerics

    out = production_numerics()
    assert "skipped" not in out, out
    assert out["flow_mean_err_px"] <= 5e-3, out
    assert out["flow_p99_err_px"] <= 5e-2, out
    assert out["bf16_cosine"] >= 0.9999, out
    assert out["bf16_median_rel"] <= 5e-2, out
    assert out["ok"] is True
