from ravvent_tpu.assembly.merger import (  # noqa: F401
    Merger,
    MergerLeftPriority,
    SeqLogitsPair,
    SingleMergerByLogits,
)
from ravvent_tpu.assembly.alignment import local_align, AlignmentResult  # noqa: F401
