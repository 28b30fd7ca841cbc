from qavit_tpu.nn.bank import (BankState, GlobalBankParams, bank_init_state,
                               bank_read, bank_write)
from qavit_tpu.nn.block import (
    QuadAttentionBlock,
    QuadBlockWithTokenLearner,
    TokenLearner,
    TokenUpMix,
)
from qavit_tpu.nn.branches import (
    ChannelGroupAttention,
    CrossAttentionBranch,
    MultiScaleDilatedAttention,
    SpatialWindowAttention,
)
from qavit_tpu.nn.hybrid import (
    CNNStemConvNeXt,
    CNNStemV1,
    ConvNeXtBlock,
    LMFAdapter,
    RRCV,
    SplitFusion,
)
from qavit_tpu.nn.layers import (
    BottleneckMLP,
    CCFFFN,
    DepthwiseConv2d,
    DropPath,
    HybridFusion,
    LinformerCompression,
    PatchEmbed,
    resize_pos_embed,
)
from qavit_tpu.nn.models import HQAViT, QAViT, build_model, init_model

__all__ = [
    "BankState", "GlobalBankParams", "bank_init_state", "bank_read", "bank_write",
    "QuadAttentionBlock", "QuadBlockWithTokenLearner",
    "TokenLearner", "TokenUpMix",
    "ChannelGroupAttention", "CrossAttentionBranch",
    "MultiScaleDilatedAttention", "SpatialWindowAttention",
    "CNNStemConvNeXt", "CNNStemV1", "ConvNeXtBlock",
    "LMFAdapter", "RRCV", "SplitFusion",
    "BottleneckMLP", "CCFFFN", "DepthwiseConv2d", "DropPath",
    "HybridFusion", "LinformerCompression", "PatchEmbed",
    "resize_pos_embed",
    "HQAViT", "QAViT", "build_model", "init_model",
]
