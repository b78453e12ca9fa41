from ravvent_tpu.data.event_detector import (  # noqa: F401
    Event,
    StreamingEventDetector,
    detect_events,
    compute_tstats,
)
