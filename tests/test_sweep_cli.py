"""sweep.py override assembly (fast-suite defaults, --no-fast, --parallel)."""

import subprocess
import sys


def _run(args):
    out = subprocess.run(
        [sys.executable, "launch_script/sweep.py", "--dry-run"] + args,
        capture_output=True, text=True, check=True)
    return out.stdout


def test_fast_defaults_applied():
    out = _run(["--task", "depth", "--models", "dino_b16"])
    assert "system.cache_features=true" in out
    assert "system.backbone_dtype=bfloat16" in out
    assert "system.probe_dtype=bfloat16" in out
    assert "+backbone.return_multilayer=True" in out


def test_no_fast_opt_out():
    out = _run(["--task", "depth", "--models", "dino_b16", "--no-fast"])
    assert "cache_features" not in out
    assert "probe_dtype" not in out


def test_eval_tasks_skip_training_overrides():
    out = _run(["--task", "spair", "--models", "dino_b16"])
    assert "cache_features" not in out
    assert "return_multilayer" not in out
    assert "evaluate_spair_correspondence.py" in out


def test_parallel_flag_accepted():
    out = _run(["--task", "depth", "--models", "a", "b", "--parallel", "2"])
    assert out.count("[sweep]") >= 2
