from vit_exp_tpu.ops.posemb import sincos_pos_embed_3d
from vit_exp_tpu.ops.patches import patchify_3d, unpatchify_heads
from vit_exp_tpu.ops.attention import cosine_attention
