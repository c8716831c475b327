from .api import Emitter, Inputer, Mapper, Outputer, Reducer
from .engine import Job, JobConfig, MapReduceEngine
from .demo import DemoMapper, DemoReducer
from .io import DataFrameInputer, DirectoryInputer, MemoryInputer, MemoryOutputer, split_file_into_chunks

__all__ = [
    "Emitter",
    "Inputer",
    "Mapper",
    "Outputer",
    "Reducer",
    "Job",
    "JobConfig",
    "MapReduceEngine",
    "DemoMapper",
    "DemoReducer",
    "DataFrameInputer",
    "DirectoryInputer",
    "MemoryInputer",
    "MemoryOutputer",
    "split_file_into_chunks",
]
