"""aero_tpu — a TPU-native zk-STARK proving framework.

A from-scratch rebuild of the capabilities of starkoracles/Aero (Miden-VM STARK
proofs over the Goldilocks field with blake2s-256 hashing, verified by a Cairo
verifier), redesigned for TPU hardware:

- `aero_tpu.spec`     — the executable protocol specification in pure Python.
                        Bit-exact semantics (field, Fiat-Shamir, Merkle, FRI,
                        winterfell-0.4-compatible proof serialization). Slow;
                        used as the test oracle and for host-side small math.
- `aero_tpu.field`    — Goldilocks arithmetic as vectorized JAX (2x uint32
                        limbs) + Pallas TPU kernels.
- `aero_tpu.hash`     — blake2s-256 batched over rows, JAX/Pallas.
- `aero_tpu.ntt`      — radix-2 NTT/iNTT + low-degree extension, single chip
                        and sharded over a device mesh.
- `aero_tpu.merkle`   — sharded Merkle commitments and batch openings.
- `aero_tpu.air`      — AIR abstraction + concrete AIRs (Fibonacci, Miden).
- `aero_tpu.prover`   — the STARK prover pipeline (TPU compute path).
- `aero_tpu.verifier` — full STARK verifier (host + JAX).
- `aero_tpu.vm`       — Miden VM executor (assembler + processor).
- `aero_tpu.parallel` — device-mesh/sharding utilities.
- `aero_tpu.io`       — proof serialization (winterfell binary, Cairo-memory
                        JSON, protobuf SDK schema).

Reference behavior studied from starkoracles/Aero (mounted read-only); this is
a new implementation, not a port.
"""

__version__ = "0.1.0"
