from vit_exp_tpu.data.tokenizer import WordPieceTokenizer, HashTokenizer, load_tokenizer
from vit_exp_tpu.data.datasets import (
    CTReportDataset,
    CTSegDataset,
    CTOpenSegDataset,
    CTReportInferenceDataset,
)
from vit_exp_tpu.data.loader import Loader, InfiniteLoader
