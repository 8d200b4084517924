"""Subprocess body for tests/test_multihost.py: one jax process of a
2-process × 4-virtual-CPU-device cluster running the synthetic trainer.

Run as:  python tests/_multihost_runner.py <process_id> <num_processes>
                                           <port> <workdir>

Writes <workdir>/proc<id>.json with the process's view of the run so the
parent test can assert cross-process agreement.
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from vit_exp_tpu.core import multihost

    assert multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4

    from vit_exp_tpu.core.config import ExperimentConfig
    from vit_exp_tpu.core.mesh import MeshConfig
    from vit_exp_tpu.core.precision import FP32_POLICY
    from vit_exp_tpu.data.synthetic import SyntheticCTDataset
    from vit_exp_tpu.data.tokenizer import HashTokenizer
    from vit_exp_tpu.models.bert import BertConfig
    from vit_exp_tpu.models.factory import build_ctclip
    from vit_exp_tpu.train.trainer import CTClipTrainer

    config = ExperimentConfig.from_dict(
        {
            "random_seed": 7,
            "results_folder": os.path.join(workdir, "results"),
            "trainer": {
                "lr": 1e-3,
                "num_train_steps": 2,
                "max_grad_norm": 1.0,
                "save_model_every": 2,
                "eval_model_every": 0,
            },
            "arch": {
                "dim": 24, "image_size": 8, "patch_size": 4,
                "temporal_size": 8, "temporal_patch_size": 4,
                "transformer_blocks": 1, "dim_head": 4, "heads": 2,
            },
            "train_data_list": [
                {"name": "reports", "type": "imagereport", "batch_size": 1},
            ],
        }
    )
    tok = HashTokenizer(vocab_size=128, max_length=12)
    model = build_ctclip(config, bert_config=BertConfig.tiny(),
                         policy=FP32_POLICY, dim_latent=16)
    datasets = [
        SyntheticCTDataset("imagereport", n=8, arch=config.arch,
                           tokenizer=tok, max_text_len=12),
    ]
    trainer = CTClipTrainer(
        model, config, datasets=datasets,
        mesh_config=MeshConfig(data=-1, fsdp=1, model=1),
    )
    assert trainer.mesh.devices.size == 4 * nproc  # spans BOTH hosts
    assert trainer.process_count == nproc
    # per-host loader: half the global batch, disjoint index stride
    assert trainer.loaders[0].loader.batch_size == 8 // nproc
    assert trainer.loaders[0].loader.shard_id == pid

    trainer.train(num_steps=2)

    # one more materialized step: psum'd global loss must agree everywhere
    logs = trainer.train_step()
    losses = {k: float(v) for k, v in logs.items()}

    # eval engine over the SAME cross-host mesh: volumes shard over all 8
    # devices, outputs come back replicated (replicated_out) so every
    # process can read the full probability matrix
    import numpy as np

    from vit_exp_tpu.eval.zero_shot import ZeroShotClassifier

    engine = ZeroShotClassifier(
        model, trainer.state.params, tok, batch_size=1, mesh=trainer.mesh,
        max_text_len=12)
    vols = np.stack([datasets[0][i]["image"] for i in range(8)])
    probs = engine.predict_batch(vols)
    assert probs.shape == (8, 18)

    out = {
        "process": pid,
        "step": trainer.step,
        "losses": losses,
        "logger_enabled": trainer.logger.enabled,
        "ckpt_latest": trainer.ckpt.latest_step(),
        "probs_sum": float(probs.sum()),
        "probs_first": [float(x) for x in probs[0]],
    }
    with open(os.path.join(workdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"proc{pid} OK", flush=True)


if __name__ == "__main__":
    main()
