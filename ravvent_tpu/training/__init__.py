from ravvent_tpu.training.loop import Trainer, make_optimizer  # noqa: F401
