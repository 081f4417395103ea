"""Multi-PROCESS distributed execution (scripts/multiprocess_proof.py).

The one execution mode everything else only emulates: 2 coordinated jax
processes (jax.distributed.initialize, 4 emulated CPU devices each, Gloo
collectives) run the stage-2 FSDP step and the stage-1 contrastive step on
per-process batch halves and must reproduce the single-process 8-device
loss; orbax saves from both processes and restores; the per-host shard
split (data/cavp_shards.py, reference data.py:1539) feeds disjoint shards
to each process through the real loader.

Reference parity: training/open_cavp_main/src/training/distributed.py:35-114
(multi-node launcher env + process group init).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_proof(tmp_path):
    out = tmp_path / "distributed.json"
    env = dict(os.environ)
    # the orchestrator spawns its own children with controlled env; it only
    # needs a plain python without a pre-initialised jax backend
    env.pop("_DFT_MP_ROLE", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiprocess_proof.py"),
         "--out", str(out)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=2400,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    res = json.loads(out.read_text())
    assert res["ok"] is True
    assert res["process_count"] == 2
    assert res["global_devices"] == 8
    assert res["stage2_fsdp"]["abs_delta"] <= 1e-5
    assert res["stage1_contrastive"]["abs_delta"] <= 1e-5
    assert res["orbax_cross_process_roundtrip"]["max_param_delta"] == 0.0
    s0 = set(res["per_host_shard_split"]["process0"])
    s1 = set(res["per_host_shard_split"]["process1"])
    assert s0 and s1 and not (s0 & s1)
