from .prover import prove
