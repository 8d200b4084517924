"""Diagnose a planted-openseg checkpoint's prediction surface on chip.

Restores the latest checkpoint under results/planted_openseg (the
scripts/train_convergence.py `planted_openseg` mid config), computes the
_sim01 prompt-similarity maps on held-out volumes, and reports: lesion vs
background sim percentiles, the dice-vs-threshold sweep, and WHERE the
confident false positives sit (other class's lesion = prompt collapse;
own-lesion halo = over-segmentation).  This is the diagnostic that pinned
the run-2/3 0.43-dice plateau (BENCH_NOTES "Seg / openseg twins"): both
prediction maps voxel-identical + tversky α=0.3 over-segmentation.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_planted_openseg.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from vit_exp_tpu.core.compile_cache import enable_compilation_cache
from vit_exp_tpu.core.config import ExperimentConfig
from vit_exp_tpu.data.planted import PLANTED_STRUCTS, PlantedOpenSegDataset, PlantedOpenSegInferenceDataset
from vit_exp_tpu.data.tokenizer import load_tokenizer
from vit_exp_tpu.models.factory import bert_config_for, build_ctclip
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.losses import _sim01
from vit_exp_tpu.train.trainer import CTClipTrainer

enable_compilation_cache()
arch = {"arch_name": "ctvit_3d", "dim": 384, "image_size": 120, "patch_size": 10,
        "temporal_size": 120, "temporal_patch_size": 10, "transformer_blocks": 4,
        "dim_head": 32, "heads": 8}
text_enc = {"num_hidden_layers": 4, "hidden_size": 384, "num_attention_heads": 6,
            "intermediate_size": 1536}
config = ExperimentConfig.from_dict({
    "random_seed": 0, "results_folder": "./results/planted_openseg",
    "trainer": {"lr": 2e-4, "warmup_steps": 30, "wd": 0.01, "max_grad_norm": 1.0,
                "num_train_steps": 1900, "eval_model_every": 0,
                "save_model_every": 0, "balance_loss_weight": [1.0]},
    "arch": arch,
    "ct_clip_arch": {"use_open_seg": True, "open_seg_loss_type": "tversky_loss",
                     "open_seg_loss_down_factor": 2},
    "train_data_list": [{"name": "planted", "type": "imageopenseg", "batch_size": 8, "num_workers": 0}],
    "text_encoder": text_enc})
tok = load_tokenizer()
bert_cfg = bert_config_for(config, tok)
model = build_ctclip(config, bert_config=bert_cfg, attn_impl="pallas", ff_impl="pallas")
train_ds = PlantedOpenSegDataset(64, arch=config.arch, tokenizer=tok, max_text_len=64, seed=0)
trainer = CTClipTrainer(model, config, datasets=[train_ds], resume_step=-1)
print("resumed step:", trainer.step, flush=True)
factor = 2
pid = jnp.asarray(train_ds.prompt_ids); pmask = jnp.asarray(train_ds.prompt_mask)

@jax.jit
def sim_map(p, video):
    o = model.apply({"params": p}, video, pid, pmask, factor, method=CTCLIP.open_seg_forward)
    return _sim01(o["seg_preds"], o["prompt_logits"])  # (B, L, C)

ds = PlantedOpenSegInferenceDataset(8, arch=config.arch, seed=1)
sims, ms = [], []
for i0 in range(0, 8, 2):
    items = [ds[i] for i in range(i0, i0+2)]
    v = jnp.asarray(np.stack([it["image"] for it in items]))
    sims.append(np.asarray(sim_map(trainer.state.params, v)))
    ms.append(np.stack([it["seg_mask"] for it in items]))
sim = np.concatenate(sims)         # (N, L, C)
mask = np.concatenate(ms)[:, :, ::2, ::2, ::2]  # (N, C, 60,60,60)
N, L, C = sim.shape
t = mask.transpose(0,2,3,4,1).reshape(N, -1, C).astype(np.float32)
print("sim shape", sim.shape, "mask frac", t.mean())
for c in range(C):
    les = sim[...,c][t[...,c]>0.5]; bg = sim[...,c][t[...,c]<0.5]
    print(f"class {c} ({PLANTED_STRUCTS[c]}): lesion sim p10/50/90 = "
          f"{np.percentile(les,[10,50,90]).round(3)}  bg p50/90/99 = {np.percentile(bg,[50,90,99]).round(3)}")
for th in [0.3,0.4,0.45,0.5,0.55,0.6,0.7]:
    pred = (sim >= th).astype(np.float32)
    inter = (pred*t).sum(1); union = pred.sum(1)+t.sum(1)
    d = 2*inter/np.maximum(union,1e-9)
    d[(t.sum(1)==0)&(pred.sum(1)==0)] = np.nan
    print(f"th {th}: mean dice {np.nanmean(d):.4f} per-class {np.nanmean(d,0).round(3)}")
# boundary analysis at 0.5: dice against eroded mask core (1.2 sigma vs 1.5)

# where are the confident false positives?
pred = (sim >= 0.5)
m3 = mask.astype(bool)  # (N, C, 60,60,60)
import numpy as np
def dilate(m, k):
    out = m.copy()
    for ax in (1,2,3):
        for sh in range(1, k+1):
            out |= np.roll(m, sh, axis=ax) | np.roll(m, -sh, axis=ax)
    return out
for c in range(C):
    p3 = pred[...,c].reshape(N,60,60,60)
    gt = m3[:,c]; other = m3[:,1-c]
    fp = p3 & ~gt
    print(f"class {c}: pred vox {p3.sum()}, gt vox {gt.sum()}, FP {fp.sum()}")
    print(f"  FP on OTHER class's lesion: {(fp & other).sum()} ({(fp & other).sum()/max(fp.sum(),1):.1%})")
    halo = dilate(gt, 3) & ~gt
    print(f"  FP in 3-voxel halo of own lesion: {(fp & halo).sum()} ({(fp & halo).sum()/max(fp.sum(),1):.1%})")
    print(f"  FN: {(gt & ~p3).sum()} ({(gt & ~p3).sum()/max(gt.sum(),1):.1%} of gt)")
