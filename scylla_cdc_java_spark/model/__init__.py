from .ops import OperationType
from .schema import CDC_ENVELOPE_FIELDS, CdcTableDescriptor, build_cdc_log_schema
from .state import TaskId, TaskState, task_state_from_map, task_state_to_map

__all__ = [
    "OperationType",
    "CDC_ENVELOPE_FIELDS",
    "CdcTableDescriptor",
    "build_cdc_log_schema",
    "TaskId",
    "TaskState",
    "task_state_from_map",
    "task_state_to_map",
]
