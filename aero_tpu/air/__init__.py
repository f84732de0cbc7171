from .air import Air, Assertion, TransitionDegree
from .fib import FibAir
from .miden import MidenAir, make_public_inputs
