"""Fine-tuning CLI — ct_lipro_train.py / ct_vocabfine_train.py equivalents,
plus the ct_lipro_inference.py evaluation path.

Usage:
    python -m vit_exp_tpu.cli.run_finetune lipro --config cfg.yaml \
        --pretrained ckpt [--synthetic N] [--epochs N] [--lr ...] \
        [--save_path head.msgpack]
    python -m vit_exp_tpu.cli.run_finetune lipro --config cfg.yaml \
        --pretrained ckpt --infer --load_head head.msgpack \
        --results_folder out/      # ct_lipro_inference.py artifacts
    python -m vit_exp_tpu.cli.run_finetune vocabfine --config cfg.yaml \
        --pretrained ckpt [--synthetic N] [--save_path CTClip.ft.pt] ...

Save semantics follow the reference: lipro persists the probe head
(ct_lipro_inference.py:38-42 saves the classifier state dict over a frozen
backbone); vocabfine fine-tunes the WHOLE model and saves a reference-layout
CTClip .pt (ct_vocabfine_train.py:134-149) — evaluate it with
run_zero_shot_cls --torch_ckpt, exactly like any reference checkpoint.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["lipro", "vocabfine"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--pretrained", default=None,
                        help="orbax checkpoint dir (ckpt_N); random init if absent")
    parser.add_argument("--torch_ckpt", action="store_true")
    parser.add_argument("--vocab", default=None)
    parser.add_argument("--data_folder", default=None)
    parser.add_argument("--reports_csv", default=None)
    parser.add_argument("--labels_csv", default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--wd", type=float, default=0.1)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--max_text_len", type=int, default=512,
                        help="vocabfine prompt tokenization length "
                        "(reference max_length, ct_vocabfine_train.py)")
    parser.add_argument("--save_path", default=None,
                        help="lipro: probe-head msgpack out; vocabfine: "
                        "reference-layout CTClip .pt out")
    parser.add_argument("--infer", action="store_true",
                        help="lipro only: skip training, evaluate the probe "
                        "(ct_lipro_inference.py) and write artifacts")
    parser.add_argument("--load_head", default=None,
                        help="probe-head msgpack to load before --infer")
    parser.add_argument("--results_folder", default=None,
                        help="artifact dir for --infer (predicted/labels "
                        "npz, accessions.txt, aurocs.json)")
    args = parser.parse_args(argv)
    if args.infer and args.mode != "lipro":
        parser.error("--infer is lipro-only; evaluate a vocabfine export "
                     "with run_zero_shot_cls --torch_ckpt")
    if args.infer and not args.load_head:
        # the reference inference always loads the trained classifier
        # (ct_lipro_inference.py:132) — evaluating the random-init head
        # writes meaningless AUROC artifacts
        parser.error("--infer requires --load_head (a trained probe head); "
                     "without it the random-init head would be evaluated")
    if args.torch_ckpt and not args.pretrained:
        # --torch_ckpt only qualifies --pretrained; without it the save-time
        # like= export would torch.load(None) after training completed
        parser.error("--torch_ckpt requires --pretrained (the reference "
                     ".pt checkpoint it qualifies)")

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from vit_exp_tpu.core.config import load_config
    from vit_exp_tpu.data.tokenizer import load_tokenizer
    from vit_exp_tpu.models.ctclip import CTCLIP
    from vit_exp_tpu.models.factory import bert_config_for, build_ctclip

    from vit_exp_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    config = load_config(args.config)
    tokenizer = load_tokenizer(args.vocab)
    bert_cfg = bert_config_for(config, tokenizer)
    attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    model = build_ctclip(config, bert_config=bert_cfg, attn_impl=attn_impl)

    a = config.arch
    video0 = jnp.zeros((1, a.channels, a.temporal_size, a.image_size,
                        a.image_size), jnp.float32)
    if args.pretrained:
        from vit_exp_tpu.cli.run_zero_shot_cls import load_params

        params = load_params(model, config, args.pretrained,
                             torch_ckpt=args.torch_ckpt, bert_cfg=bert_cfg)
    else:
        params = nn.unbox(
            model.init(jax.random.PRNGKey(0), video0,
                       jnp.zeros((1, 16), jnp.int32), method=CTCLIP.init_all)
        )["params"]

    if args.synthetic:
        from vit_exp_tpu.data.synthetic import SyntheticInferenceDataset

        dataset = SyntheticInferenceDataset(args.synthetic, arch=config.arch)
    else:
        from vit_exp_tpu.data.datasets import CTReportInferenceDataset

        dataset = CTReportInferenceDataset(
            args.data_folder, args.reports_csv, args.labels_csv,
            tokenizer=tokenizer,
        )

    # schedule horizon must match the loop's actual optimizer-step count:
    # lipro steps once per batch, vocabfine once per SAMPLE (reference
    # ct_vocabfine_train.py:69 uses batch_size=1) — a //batch_size horizon
    # there would decay the cosine LR to 0 halfway through training
    if args.mode == "lipro":
        total = args.epochs * max(len(dataset) // args.batch_size, 1)
        from vit_exp_tpu.finetune.lipro import LiProTrainer

        trainer = LiProTrainer(
            model, params, lr=args.lr or 1e-3, wd=args.wd, total_steps=total,
        )
        if args.infer:
            import json

            trainer.load(args.load_head)
            res = trainer.infer(dataset,
                                results_folder=args.results_folder,
                                batch_size=args.batch_size)
            print(json.dumps(res, indent=2))
            return
        for epoch in range(args.epochs):
            for start in range(0, len(dataset), args.batch_size):
                items = [dataset[i] for i in
                         range(start, min(start + args.batch_size,
                                          len(dataset)))]
                video = np.stack([it["image"] for it in items])
                labels = np.stack([it["onehot"][:18] for it in items])
                loss = trainer.fit_batch(video, labels)
            print(f"epoch {epoch}: loss {loss:.4f}")
        if args.save_path:
            trainer.save(args.save_path)
            print(f"saved probe head → {args.save_path}")
    else:
        from vit_exp_tpu.finetune.vocabfine import VocabFineTrainer

        total = args.epochs * len(dataset)
        trainer = VocabFineTrainer(
            model, params, tokenizer, lr=args.lr or 5e-6, wd=args.wd,
            total_steps=total, max_text_len=args.max_text_len,
        )
        for epoch in range(args.epochs):
            for i in range(len(dataset)):
                item = dataset[i]
                loss = trainer.fit_batch(
                    item["image"][None], item["onehot"][:18]
                )
            print(f"epoch {epoch}: loss {loss:.4f}")
        if args.save_path:
            from vit_exp_tpu.models.convert import save_ctclip_checkpoint

            grid = (a.temporal_size // a.temporal_patch_size,
                    a.image_size // a.patch_size,
                    a.image_size // a.patch_size)
            like = None
            if args.torch_ckpt:
                # fine-tuning started from a real reference .pt: pass it as
                # like= so the export keeps that checkpoint's values for
                # keys we synthesize (to_pixels, spatial_rel_pos_bias, …)
                # instead of zero/reference-init fills — lossless round-trip
                import torch

                like = torch.load(args.pretrained, map_location="cpu")
            save_ctclip_checkpoint(
                args.save_path, jax.device_get(trainer.params), grid=grid,
                heads=a.heads, bert_config=bert_cfg, like=like,
            )
            print(f"saved reference-layout checkpoint → {args.save_path}")


if __name__ == "__main__":
    main()
