from vit_exp_tpu.models.ctvit3d import CTViT3D
from vit_exp_tpu.models.ctvit import CTViT
from vit_exp_tpu.models.bert import BertConfig, BertModel, convert_hf_bert_params
from vit_exp_tpu.models.ctclip import CTCLIP
from vit_exp_tpu.models.vq import VectorQuantize
from vit_exp_tpu.models.maskgit import MaskGit
from vit_exp_tpu.models.maskgit_pipeline import MaskGITTransformer
from vit_exp_tpu.models.factory import build_ctclip, build_image_encoder
from vit_exp_tpu.models.convert import (
    convert_ctclip_state_dict,
    load_ctclip_checkpoint,
)
