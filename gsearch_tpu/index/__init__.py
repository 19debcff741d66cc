from .flat import FlatIndex
from .serialize import load_index, INDEX_META_FILE
