from vla_rft_tpu.ops.attention import attention  # noqa: F401
from vla_rft_tpu.ops.masked import (  # noqa: F401
    masked_mean,
    masked_var,
    masked_whiten,
    entropy_from_logits,
    logprobs_from_logits,
)
from vla_rft_tpu.ops.sampling import sample_token  # noqa: F401
