"""Mini convergence regression (VERDICT round-2 ask #1): a few hundred CPU
steps on the analytic ConsistentScene must drive the loss down and raise the
train-view PSNR.  The full 3k-step TPU run lives in
scripts/convergence_run.py (results: CONVERGENCE.md)."""

import json
import os
import subprocess
import sys

import pytest

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "scripts", "convergence_run.py")


@pytest.mark.slow
def test_quick_convergence_cpu(tmp_path):
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("PYTEST_CURRENT_TEST", None)
  proc = subprocess.run(
      [sys.executable, _SCRIPT, "--quick", "--steps", "120",
       "--eval_every", "60", "--gate_db", "1.5",
       "--outdir", str(tmp_path), "--tag", "ci"],
      env=env, capture_output=True, text=True, timeout=1800)
  assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
  with open(os.path.join(str(tmp_path), "convergence_ci.json")) as fh:
    result = json.load(fh)
  assert result["gate_passed"], result
  assert result["loss_drop"] > 0
  assert result["novel_psnr_rise_db"] >= 1.5


@pytest.mark.slow
def test_resume_merges_prior_curve(tmp_path):
  """A --resume run must fold the prior run's eval curve into its own so
  'rise over init' spans the whole history (a dead accelerator tunnel
  mid-run must not reset the gate's baseline)."""
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("PYTEST_CURRENT_TEST", None)
  base = [sys.executable, _SCRIPT, "--quick", "--eval_every", "30",
          "--gate_db", "0.0", "--outdir", str(tmp_path), "--tag", "rm"]
  first = subprocess.run(base + ["--steps", "60"], env=env,
                         capture_output=True, text=True, timeout=1800)
  assert first.returncode == 0, first.stdout[-3000:] + first.stderr[-2000:]
  second = subprocess.run(base + ["--steps", "120", "--resume"], env=env,
                          capture_output=True, text=True, timeout=1800)
  assert second.returncode == 0, (
      second.stdout[-3000:] + second.stderr[-2000:])
  assert "merged" in second.stdout, second.stdout[-2000:]
  with open(os.path.join(str(tmp_path), "convergence_rm.json")) as fh:
    result = json.load(fh)
  steps = [r["step"] for r in result["curve"]]
  assert steps[0] == 0 and steps == sorted(steps), steps
  assert any(s <= 60 for s in steps[1:]) and steps[-1] == 120, steps
