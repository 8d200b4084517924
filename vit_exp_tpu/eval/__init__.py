from vit_exp_tpu.eval.metrics import evaluate_internal, bootstrap_auroc
from vit_exp_tpu.eval.zero_shot import (
    PATHOLOGIES,
    build_pathology_prompts,
    ZeroShotClassifier,
)
