from .base import Node  # noqa: F401
from .ctx import CombineCtx, EmptyMeta, SaveContext, SetCtx, UseMetaFromCtx  # noqa: F401
from .explode import Yielder, aggregate_substates  # noqa: F401
from .mapping import FuncNode, JoinMapItem, Map, MapItem, MsgFuncNode, ToOrderedDict  # noqa: F401
from .parsers import (  # noqa: F401
    B64Decode,
    B64Encode,
    CSV2Python,
    CSVstr2Python,
    Decode,
    Encode,
    HL7ToPython,
    JsonToPython,
    Python2CSVstr,
    PythonToHL7,
    PythonToJson,
    PythonToXML,
    XMLToPython,
)
from .enrich import FileReader, HttpRequest  # noqa: F401
from .routing import Drop, Empty, RaiseError, Reject  # noqa: F401
from .sinks import Email, FileCleaner, FileMover, FileWriter, Log, Save, Sleep  # noqa: F401
