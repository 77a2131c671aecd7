from .blocks import (
    AdaLNZero,
    Attention,
    BiaslessLayerNorm,
    Block,
    ClipStyleProjection,
    ConditionedBlock,
    MAPAttention,
    MAPBlock,
    MeanPooling,
    MLP,
    NoiseBlock,
    RMSNorm,
    SigmaEmbedding,
    SinusoidalPosEmb,
    SwishGLU,
    TransformerDecoder,
    TransformerEncoder,
    TransformerFiLMDecoder,
    modulate,
)
from .mdtv_transformer import MDTVTransformer
from .mdt_transformer import MDTTransformer
from .perceiver import PerceiverResampler
