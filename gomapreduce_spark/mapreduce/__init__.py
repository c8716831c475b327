from .api import Emitter, Inputer, Mapper, Outputer, Reducer
from .chaos import InjectedFailure, unreliable_partition
from .clerk import Clerk
from .engine import Job, JobConfig, MapReduceEngine
from .demo import DemoMapper, DemoReducer
from .io import DataFrameInputer, DirectoryInputer, MemoryInputer, MemoryOutputer, split_file_into_chunks

__all__ = [
    "Clerk",
    "Emitter",
    "InjectedFailure",
    "unreliable_partition",
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
