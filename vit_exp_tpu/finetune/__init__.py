from vit_exp_tpu.finetune.lipro import LiProHead, LiProTrainer, LIPRO_POS_WEIGHTS
from vit_exp_tpu.finetune.vocabfine import VocabFineTrainer
