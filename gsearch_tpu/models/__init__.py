from .base import SketcherBase, make_sketcher
from .optdens import OptDensSketcher, RevOptDensSketcher
from .superminhash import SuperMinHashSketcher, SuperMinHash2Sketcher
from .probminhash import ProbMinHashSketcher
from .setsketch import SetSketchSketcher
from .ani import ani_from_distance, distance_from_similarity
