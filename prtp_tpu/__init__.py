"""prtp_tpu — TPU-native pre-routing timing prediction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``ZeayW/Multimodal-fusion-based-Pre-routing-Timing-Prediction-`` (the
"reference"): multimodal fusion (levelized message-passing GNN over a
pin-level heterogeneous DAG + CNN over rasterized 2-D layout maps) for
per-endpoint arrival-time regression / critical-path classification on
ASAP7 standard-cell designs.

Layer map (mirrors SURVEY.md §1 of the reference):

- :mod:`prtp_tpu.data`     — host-side pipeline: ``.tarpt`` timing-report
  parser, structural Verilog netlist parser, pin-DAG builder, topo
  levelization, feature extraction, sparse path-mask rasterization, and
  array serialization.  Replaces ``verilog_parser_asap7.py`` /
  ``dataset.py`` / ``generate_data.py`` (pyverilog/networkx/DGL-free).
- :mod:`prtp_tpu.ops`      — TPU compute primitives: segment reductions,
  segment softmax, masked feature-map products, Pallas kernels.
- :mod:`prtp_tpu.models`   — Flax models: ``MLP``, ``TimeGNN`` (the
  reference ``PathConv``, re-designed as a ``lax.scan`` over padded
  per-level edge tables), ``LayoutNet``, ``UNet``, ``PathModel`` fusion.
- :mod:`prtp_tpu.parallel` — mesh construction and data-parallel
  training via ``shard_map`` + ``psum`` (additive capability; the
  reference is single-device).
- :mod:`prtp_tpu.utils`    — metrics (R², confusion/F1, MAPE), stdio
  tee logging, pickle-free checkpointing.
- :mod:`prtp_tpu.train` / :mod:`prtp_tpu.test` — CLI drivers preserving
  the reference's flag surface (``src/options.py:4-56``).
"""

__version__ = "0.1.0"
