"""Dense session-graph construction (host side, numpy) and batch pytrees."""

from sessionrec_tpu.graph.batch import (  # noqa: F401
    CcsBatch,
    CcsLevel,
    LessrBatch,
    SessionGraphBatch,
)
from sessionrec_tpu.graph.builders import (  # noqa: F401
    build_ccs_batch,
    build_lessr_batch,
    build_session_batch,
)
