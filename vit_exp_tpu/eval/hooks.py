"""Config-named evaluation hooks for in-training testing.

The reference names its hooks in `valid_test_list` / `sample_test_list`
(configs §2.7) and resolves them by function name
(CTCLIPTrainer.create_valid_tests, CTCLIPTrainer.py:270-281):
- ctclip_image_report_zero_shot_cls_test → zero-shot AUROC over a
  validation set (zero_shot.py:333-362);
- radgenome_image_open_seg_test_ten_images → open-seg similarity-map
  visualizations (CTCLIPTrainer.py:49-84).

build_eval_hooks() resolves those names to hook callables over OUR engines.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from vit_exp_tpu.models.ctclip import CTCLIP


def make_zero_shot_cls_hook(
    model: CTCLIP, tokenizer, dataset, *, pathologies=None, limit=10,
    batch_size: int = 2, max_text_len: int = 512,
) -> Callable:
    """params → per-label AUROC dict (trainer logs under eval/<name>/)."""
    from vit_exp_tpu.eval.zero_shot import PATHOLOGIES, ZeroShotClassifier

    pathologies = pathologies or PATHOLOGIES

    box = {}

    def hook(params):
        # ONE engine per hook for the whole run: rebuilding would define
        # fresh @jax.jit closures and recompile at every periodic eval
        # (1-2 min each through the remote-compile relay)
        if "engine" not in box:
            box["engine"] = ZeroShotClassifier(
                model, params, tokenizer, pathologies=pathologies,
                batch_size=batch_size, max_text_len=max_text_len,
            )
        else:
            box["engine"].set_params(params)
        return box["engine"].infer(dataset, limit=limit)

    return hook


def make_seg_dice_hook(model: CTCLIP, dataset, *, limit=10) -> Callable:
    from vit_exp_tpu.eval.zero_shot import ZeroShotSegmenter

    box = {}

    def hook(params):
        if "engine" not in box:
            box["engine"] = ZeroShotSegmenter(model, params)
        else:
            box["engine"].set_params(params)
        return box["engine"].infer(dataset, limit=limit)

    return hook


def build_eval_hooks(
    config,
    model: CTCLIP,
    tokenizer,
    *,
    cls_dataset=None,
    seg_dataset=None,
    open_seg_dataset=None,
    results_folder: Optional[str] = None,
    cls_pathologies=None,
    cls_max_text_len: int = 512,
) -> Dict[str, Dict[str, Callable]]:
    """Resolve config.valid_test_list / sample_test_list names.

    Returns {"eval_hooks": {...}, "sample_hooks": {...}} for CTClipTrainer.
    cls_pathologies/cls_max_text_len override the zero-shot hook's label
    set (default: the standard 18) — the planted integration runs score
    the 4 planted attributes instead."""
    eval_hooks: Dict[str, Callable] = {}
    sample_hooks: Dict[str, Callable] = {}
    for name in config.valid_test_list or []:
        if "zero_shot_cls" in name and cls_dataset is not None:
            eval_hooks[name] = make_zero_shot_cls_hook(
                model, tokenizer, cls_dataset,
                pathologies=cls_pathologies,
                max_text_len=cls_max_text_len,
            )
        elif "seg_test" in name and seg_dataset is not None:
            eval_hooks[name] = make_seg_dice_hook(model, seg_dataset)
    for name in config.sample_test_list or []:
        if "open_seg" in name and open_seg_dataset is not None:
            from vit_exp_tpu.eval.vis_hooks import make_open_seg_vis_hook

            out_dir = (results_folder or config.results_folder) + "/samples"
            sample_hooks[name] = make_open_seg_vis_hook(
                model, open_seg_dataset, out_dir=out_dir,
            )
    return {"eval_hooks": eval_hooks, "sample_hooks": sample_hooks}
