from .mesh import make_device_mesh, sharded_knn, sharded_sketch_and_knn_step
