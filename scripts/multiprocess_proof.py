"""Multi-PROCESS (multi-host) distributed execution proof.

The reference's distributed story is launcher env plumbing that real
multi-node runs exercise (training/open_cavp_main/src/training/
distributed.py:35-114 — torchrun/SLURM/MPI env discovery + NCCL
init_process_group; per-node shard split data.py:1539). The TPU-native
analogue is `jax.distributed.initialize` + GSPMD over a global mesh;
this script EXECUTES that mode without a pod: it spawns 2 coordinated
processes x 4 emulated CPU devices each (Gloo collectives) and proves

  1. a stage-2 FSDP train step over the global 8-device mesh, fed from
     PER-PROCESS local batch halves, produces the SAME loss as the
     single-process 8-device run of the identical global batch;
  2. a stage-1 CAVP contrastive step — global-batch logits spanning the
     process boundary (the semantics of gather_features, loss.py:21-65)
     — likewise matches single-process;
  3. orbax save from BOTH processes (sharded state) + restore in the
     same topology round-trips;
  4. the per-host shard split (data/cavp_shards.py::iter_shards
     process_index/process_count args; reference data.py:1539
     split_by_node) is disjoint and covering across the 2 processes.

Run standalone to (re)generate DISTRIBUTED_r05.json:
    python scripts/multiprocess_proof.py
Invoked by tests/test_multiprocess.py with --out <tmpfile>.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ROLE = "_DFT_MP_ROLE"  # "child:<pid>:<port>" | "baseline"

# deterministic global batches, identical in every mode ---------------------
GLOBAL_B2 = 8   # stage-2 batch (1 per device)
GLOBAL_B1 = 8   # stage-1 batch
N_SHARDS = 6    # tiny tar shards for the per-host split check


def _write_shards(d: str) -> None:
    """N_SHARDS 1-sample tar shards; sample i's spec is constant i/100, so a
    decoded sample identifies its source shard by spec mean."""
    import io
    import tarfile

    import cv2
    import numpy as np

    os.makedirs(d, exist_ok=True)
    for i in range(N_SHARDS):
        with tarfile.open(os.path.join(d, f"shard-{i:05d}.tar"), "w") as tf:
            spec = np.full((128, 640), i / 100.0, np.float32)
            buf = io.BytesIO()
            np.save(buf, spec)
            info = tarfile.TarInfo("sample0.spec.npy")
            info.size = buf.getbuffer().nbytes
            buf.seek(0)
            tf.addfile(info, buf)
            strip = np.zeros((32, 32 * 40, 3), np.uint8)
            ok, enc = cv2.imencode(".jpg", strip)
            assert ok
            info = tarfile.TarInfo("sample0.video.jpg")
            info.size = len(enc)
            tf.addfile(info, io.BytesIO(enc.tobytes()))


def _stage2_global_batch():
    import numpy as np

    rng = np.random.default_rng(1234)
    return {
        "spec": rng.uniform(size=(GLOBAL_B2, 32, 64, 3)).astype(np.float32),
        "video_feat": rng.normal(size=(GLOBAL_B2, 8, 512)).astype(np.float32),
    }


def _stage1_global_batch():
    import numpy as np

    rng = np.random.default_rng(4321)
    return {
        "video": rng.uniform(size=(GLOBAL_B1, 2, 16, 16, 16, 3)).astype(
            np.float32),
        "spec": rng.uniform(size=(GLOBAL_B1, 2, 128, 256)).astype(np.float32),
    }


def _build_and_step(local_slice):
    """Shared model/step construction for child and baseline modes.

    `local_slice(batch)` returns this process's slice of a global batch
    (identity for the single-process baseline). Returns the metrics dict.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diff_foley_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LDMConfig,
    )
    from diff_foley_tpu.models.cavp.cavp import CAVPConfig, CAVPModel
    from diff_foley_tpu.models.unet import UNetConfig
    from diff_foley_tpu.models.vae import VAEConfig
    from diff_foley_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from diff_foley_tpu.parallel.sharding_rules import fsdp_shardings
    from diff_foley_tpu.train.stage1_cavp import (
        Stage1TrainConfig,
        init_train_state as init_cavp_state,
        make_train_step as make_cavp_step,
    )
    from diff_foley_tpu.train.stage2_ldm import (
        Stage2TrainConfig, init_train_state, make_train_step,
    )

    out = {}
    mesh = make_mesh(n_data=8, n_model=1, devices=jax.devices())

    # ---- stage-2 FSDP step -------------------------------------------------
    ldm = LatentDiffusion(LDMConfig(
        unet=UNetConfig(
            model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
            attention_resolutions=(1, 2), num_heads=4, context_dim=24,
        ),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        cond_embed_dim=24, cond_seq_len=8,
    ))
    tcfg = Stage2TrainConfig(use_ema=True, compute_dtype="bfloat16")
    state = jax.jit(lambda k: init_train_state(ldm, k, tcfg))(
        jax.random.PRNGKey(0))
    state_sh = fsdp_shardings(state, mesh, min_size=1024)
    state = jax.tree.map(jax.device_put, state, state_sh)
    vae_params = replicate(
        mesh, jax.jit(ldm.init_vae_params)(jax.random.PRNGKey(1)))

    n_fsdp = sum(
        1 for leaf in jax.tree.leaves(state.params)
        if hasattr(leaf, "addressable_shards")
        and leaf.addressable_shards[0].data.size < leaf.size
    )
    assert n_fsdp > 0, "FSDP sharded no parameter"
    out["fsdp_sharded_param_leaves"] = n_fsdp

    batch = shard_batch(mesh, local_slice(_stage2_global_batch()))
    rng = replicate(mesh, jax.random.PRNGKey(2))
    step = jax.jit(make_train_step(ldm, tcfg))
    with mesh:
        state2, metrics = step(state, vae_params, batch, rng)
    out["stage2_loss"] = float(metrics["loss"])
    out["stage2_step"] = int(state2.step)

    # ---- stage-1 contrastive step (global logits) --------------------------
    cavp = CAVPModel(CAVPConfig(
        video_stage_blocks=(1, 1, 1, 1), video_base_channels=16,
        spec_channels=(8, 8, 8, 8, 8, 8),
    ))
    s1cfg = Stage1TrainConfig(clip_num=2, total_steps=10, warmup_steps=1)
    s1state = jax.jit(lambda k: init_cavp_state(
        cavp, k, s1cfg,
        video_shape=(1, 16, 16, 16, 3), spec_shape=(1, 128, 256),
    ))(jax.random.PRNGKey(3))
    s1state = replicate(mesh, s1state)
    s1batch = shard_batch(mesh, local_slice(_stage1_global_batch()))
    s1step = jax.jit(make_cavp_step(cavp, s1cfg))
    with mesh:
        _, s1metrics = s1step(
            s1state, s1batch, replicate(mesh, jax.random.PRNGKey(4)))
    out["stage1_loss"] = float(s1metrics["total_loss"])

    assert np.isfinite(out["stage2_loss"]) and np.isfinite(out["stage1_loss"])
    return mesh, state2, ldm, tcfg, out


def _run_child(process_id: int, port: int, ckpt_dir: str, out_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()

    # this process's HALF of each global batch (the per-host data-loader
    # contract: shard_batch assembles the global array from local halves)
    def local_slice(batch):
        lo = process_id * 4
        return {k: v[lo: lo + 4] for k, v in batch.items()}

    mesh, state2, ldm, tcfg, out = _build_and_step(local_slice)
    out["process_id"] = process_id
    out["process_count"] = int(jax.process_count())
    out["local_devices"] = len(jax.local_devices())
    out["global_devices"] = len(jax.devices())

    # ---- orbax save from ALL processes + same-topology restore -------------
    from diff_foley_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
    mgr.save(int(state2.step), state2)
    template = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        state2,
    )
    restored = mgr.restore(template)
    assert restored is not None
    deltas = jax.tree.map(
        lambda a, b: float(
            np.abs(np.asarray(a.addressable_shards[0].data)
                   - np.asarray(b.addressable_shards[0].data)).max()
        ),
        state2.params, restored.params,
    )
    out["orbax_restore_max_delta"] = max(jax.tree.leaves(deltas))
    out["orbax_restore_ok"] = out["orbax_restore_max_delta"] == 0.0

    # ---- per-host shard split (data/cavp_shards.py; data.py:1539) ----------
    # Drive the REAL loader: the parent wrote N_SHARDS tiny tar shards whose
    # spec contents encode the shard id; each process streams its split and
    # records which shards actually fed it.
    import glob

    from diff_foley_tpu.data.cavp_shards import CAVPShardConfig, iter_shards

    shard_paths = sorted(
        glob.glob(os.path.join(os.environ["_DFT_MP_SHARDS"], "*.tar")))
    assert len(shard_paths) == N_SHARDS, shard_paths
    seen = set()
    for s in iter_shards(
        shard_paths, seed=7, epoch=0,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        cfg=CAVPShardConfig(frame_size=32),
    ):
        seen.add(int(round(float(s["spec"].mean()) * 100)))
    out["shard_split"] = sorted(seen)

    with open(out_path, "w") as f:
        json.dump(out, f)


def _run_baseline(out_path: str):
    """Single-process 8-device run of the IDENTICAL global computation."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8
    _, _, _, _, out = _build_and_step(lambda b: b)
    out["process_count"] = 1
    with open(out_path, "w") as f:
        json.dump(out, f)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(role: str, extra_env: dict, n_devices: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.update(extra_env)
    env[_ROLE] = role
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    import re

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={n_devices}".strip())
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def orchestrate(out_json: str, timeout: int = 1200) -> dict:
    """Spawn baseline + 2 coordinated children, compare, write the artifact."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="dft_mp_")
    port = _free_port()
    ckpt_dir = os.path.join(tmp, "ckpt")
    shards_dir = os.path.join(tmp, "shards")
    _write_shards(shards_dir)
    paths = {
        "baseline": os.path.join(tmp, "baseline.json"),
        "child0": os.path.join(tmp, "child0.json"),
        "child1": os.path.join(tmp, "child1.json"),
    }
    # children run concurrently (they rendezvous); the baseline runs AFTER —
    # on few-core hosts a third concurrent jax process starves the gloo
    # rendezvous deadline
    procs = {
        "child0": _spawn(f"child:0:{port}",
                         {"_DFT_MP_CKPT": ckpt_dir,
                          "_DFT_MP_SHARDS": shards_dir,
                          "_DFT_MP_OUT": paths["child0"]}, 4),
        "child1": _spawn(f"child:1:{port}",
                         {"_DFT_MP_CKPT": ckpt_dir,
                          "_DFT_MP_SHARDS": shards_dir,
                          "_DFT_MP_OUT": paths["child1"]}, 4),
    }
    logs = {}
    for name, p in procs.items():
        stdout, _ = p.communicate(timeout=timeout)
        logs[name] = stdout[-2000:]
        if p.returncode != 0:
            raise RuntimeError(f"{name} failed (rc={p.returncode}):\n{stdout}")
    p = _spawn("baseline", {"_DFT_MP_OUT": paths["baseline"]}, 8)
    stdout, _ = p.communicate(timeout=timeout)
    logs["baseline"] = stdout[-2000:]
    if p.returncode != 0:
        raise RuntimeError(f"baseline failed (rc={p.returncode}):\n{stdout}")
    res = {k: json.load(open(v)) for k, v in paths.items()}

    c0, c1, base = res["child0"], res["child1"], res["baseline"]
    assert c0["process_count"] == 2 and c1["process_count"] == 2
    assert c0["global_devices"] == 8 and c0["local_devices"] == 4

    # 1+2: per-process-fed global step == single-process step (same program)
    d2 = abs(c0["stage2_loss"] - base["stage2_loss"])
    d1 = abs(c0["stage1_loss"] - base["stage1_loss"])
    assert d2 <= 1e-5 * max(1.0, abs(base["stage2_loss"])), (c0, base)
    assert d1 <= 1e-5 * max(1.0, abs(base["stage1_loss"])), (c0, base)
    # both processes observe the same replicated loss
    assert abs(c0["stage2_loss"] - c1["stage2_loss"]) == 0.0
    assert c0["fsdp_sharded_param_leaves"] > 0

    # 3: cross-process orbax round-trip
    assert c0["orbax_restore_ok"] and c1["orbax_restore_ok"]

    # 4: shard split disjoint + covering (through the real iter_shards)
    s0, s1 = set(c0["shard_split"]), set(c1["shard_split"])
    assert s0 and s1, "a process streamed no shards"
    assert not (s0 & s1), "per-host shard splits overlap"
    assert s0 | s1 == set(range(N_SHARDS)), "splits do not cover all shards"

    summary = {
        "ok": True,
        "process_count": 2,
        "devices_per_process": 4,
        "global_devices": 8,
        "collectives": "gloo (XLA:CPU cross-process)",
        "stage2_fsdp": {
            "multiprocess_loss": c0["stage2_loss"],
            "singleprocess_loss": base["stage2_loss"],
            "abs_delta": d2,
            "fsdp_sharded_param_leaves": c0["fsdp_sharded_param_leaves"],
        },
        "stage1_contrastive": {
            "multiprocess_loss": c0["stage1_loss"],
            "singleprocess_loss": base["stage1_loss"],
            "abs_delta": d1,
        },
        "orbax_cross_process_roundtrip": {
            "max_param_delta": max(c0["orbax_restore_max_delta"],
                                   c1["orbax_restore_max_delta"]),
        },
        "per_host_shard_split": {"process0": sorted(s0),
                                 "process1": sorted(s1)},
        "reference_parity": "training/distributed.py:35-114 (launcher env + "
                            "process group) + data.py:1539 (split_by_node)",
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    print(json.dumps(summary, indent=2))
    return summary


def main():
    role = os.environ.get(_ROLE)
    if role and role.startswith("child:"):
        _, pid, port = role.split(":")
        _run_child(int(pid), int(port), os.environ["_DFT_MP_CKPT"],
                   os.environ["_DFT_MP_OUT"])
    elif role == "baseline":
        _run_baseline(os.environ["_DFT_MP_OUT"])
    else:
        out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv \
            else os.path.join(REPO, "DISTRIBUTED_r05.json")
        orchestrate(out)


if __name__ == "__main__":
    main()
