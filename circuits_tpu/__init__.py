"""circuits_tpu — a TPU-native witness-generation and constraint-evaluation
engine with the capabilities of hermeznetwork/circuits.

Layers (see SURVEY.md §7):
  field/    BN254 Fr limb kernels (the ffiasm-equivalent, batched)
  ops/      circuit gadget kernels (Poseidon, SMT, EdDSA, SHA256, ...)
  models/   the 14 circuit templates as batched witness evaluators
  builder/  host-side batch builder (the @hermeznetwork/commonjs equivalent)
  r1cs/     constraint-residual checking + analytic constraint counts
  parallel/ multi-chip sharding of the tx lanes (shard_map / psum)
"""

__version__ = "0.1.0"
