from .kgraph import KGraph, kgraph_from_index, Hubness
from .embed import get_graph_stats_embed, Embedder, EmbedderParams
