from recombiner_tpu.coding.codebook import make_codebook  # noqa: F401
from recombiner_tpu.coding.encoder import (  # noqa: F401
    Codec,
    CodecState,
    decode,
    decode_state,
    encode_step,
    init_codec,
    optimize,
    predict,
)
from recombiner_tpu.coding.gumbel import gumbel_chain  # noqa: F401
from recombiner_tpu.coding.progressive import EncodeResult, compress  # noqa: F401
