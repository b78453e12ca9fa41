from ravvent_tpu.decode.greedy import greedy_decode  # noqa: F401
from ravvent_tpu.decode.beam import beam_decode, beam_scores_to_step_probs  # noqa: F401
