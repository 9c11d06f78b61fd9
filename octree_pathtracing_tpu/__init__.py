"""octree_pathtracing_tpu — TPU-native differentiable sparse-voxel-octree path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Rust reference
``kekley/octree_pathtracing``: Laine–Karras ESVO octree traversal, Chunky-style
sun/sky/emitter path tracing, Minecraft world ingestion, and progressive
accumulation — re-designed as a megakernel-free wavefront renderer over
structure-of-array ray batches with the octree as a flat node pool in HBM,
differentiable into voxel albedo/emission parameters, and sharded over
multi-host TPU meshes.

Layer map (mirrors SURVEY.md §1 but TPU-first):

- ``octree``   : flat node pool, Morton codecs, vectorized SVO builders
- ``ops``      : traversal + intersection + texture kernels (pure JAX/XLA —
                 Pallas was measured and rejected for this gather-bound,
                 matmul-free workload; see tools/profile_pallas.py and
                 tools/PERF_NOTES.md "Pallas verdict")
- ``models``   : scene pytrees — camera, sun, materials, procedural scenes,
                 Minecraft block models and region ingestion
- ``render``   : wavefront path tracer, progressive renderer driver, preview
- ``parallel`` : device meshes, shard_map render/train steps, collectives
- ``diff``     : detached-traversal custom_vjp + inverse rendering
- ``io``       : images, checkpoints
"""

__version__ = "0.1.0"
