from .air import Air, Assertion, TransitionDegree
from .fib import FibAir
