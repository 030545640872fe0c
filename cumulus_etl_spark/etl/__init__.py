from cumulus_etl_spark.etl.tasks import BASIC_TASKS, TaskDef, select_tasks
from cumulus_etl_spark.etl.config import JobConfig
from cumulus_etl_spark.etl.pipeline import run_convert, run_etl, run_init

__all__ = [
    "BASIC_TASKS",
    "TaskDef",
    "select_tasks",
    "JobConfig",
    "run_etl",
    "run_init",
    "run_convert",
]
