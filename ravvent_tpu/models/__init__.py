from ravvent_tpu.models.basecaller import (  # noqa: F401
    init_basecaller,
    encode_input,
    train_forward,
    loss_fn,
)
