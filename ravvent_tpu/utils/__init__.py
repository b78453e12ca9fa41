from ravvent_tpu.utils.masking import (  # noqa: F401
    input_mask,
    masked_accuracy,
    masked_ce_loss,
)
