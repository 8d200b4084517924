from vit_exp_tpu.models.ctvit3d import CTViT3D
from vit_exp_tpu.models.bert import BertConfig, BertModel, convert_hf_bert_params
from vit_exp_tpu.models.ctclip import CTCLIP
