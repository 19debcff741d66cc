from .params import (
    SketchAlgo,
    DataType,
    SeqSketcherParams,
    HnswParams,
    ProcessingParams,
    ComputingParams,
    RequestParams,
    AnnParameters,
    FilterParams,
)
from .seqdict import Id, ItemDict, SeqDict
from .state import ProcessingState
