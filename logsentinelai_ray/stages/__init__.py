from .metadata import dead_letter_split, stamp_metadata  # noqa: F401
from .severity import EVENT_PRIORITY, add_priority, severity_histogram  # noqa: F401
