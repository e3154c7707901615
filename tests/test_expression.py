"""C-string Expression evaluator unit tests (dolfin JIT Expression parity)."""

import numpy as np

from fenicssolver_tpu.core.expression import Constant, Expression
from fenicssolver_tpu.core.subdomain import CompiledSubDomain


def test_scalar_expression():
    e = Expression("exp(x[0]) + sin(x[1])*2", degree=2)
    pts = np.array([[0.0, 0.0], [1.0, np.pi / 2]])
    vals = e.eval_at(pts)
    assert np.allclose(vals, [1.0 + 0.0, np.e + 2.0])


def test_parameters_and_mutation():
    e = Expression("a*x[0] + t", degree=1, a=3.0)
    pts = np.array([[2.0, 0.0]])
    assert np.allclose(e.eval_at(pts, t=1.0), [7.0])
    e.a = 5.0  # dolfin-style parameter mutation
    assert np.allclose(e.eval_at(pts, t=0.0), [10.0])


def test_vector_and_tensor_expressions():
    v = Expression(("x[0]", "2*x[1]"), degree=1)
    out = v.eval_at(np.array([[1.0, 3.0]]))
    assert out.shape == (1, 2)
    assert np.allclose(out, [[1.0, 6.0]])
    K = Expression((("exp(x[0])", "sin(x[1])"), ("sin(x[0])", "tan(x[1])")),
                   degree=0)
    out = K.eval_at(np.array([[0.0, 0.0]]))
    assert out.shape == (1, 2, 2)
    assert np.allclose(out[0], [[1.0, 0.0], [0.0, 0.0]])


def test_pow_and_ternary():
    e = Expression("pow(x[0], 3)", degree=3)
    assert np.allclose(e.eval_at(np.array([[2.0, 0]])), [8.0])
    e2 = Expression("x[0] > 0.5 ? 10.0 : 20.0", degree=0)
    vals = e2.eval_at(np.array([[0.0, 0], [1.0, 0]]))
    assert np.allclose(vals, [20.0, 10.0])


def test_near_in_expression_and_compiled_subdomain():
    sd = CompiledSubDomain("near(x[0], side) && on_boundary", side=1.0)
    assert sd.inside(np.array([1.0, 0.3]), True)
    assert not sd.inside(np.array([0.5, 0.3]), True)
    assert not sd.inside(np.array([1.0, 0.3]), False)


def test_constant_shapes():
    c = Constant(2.5)
    assert float(c) == 2.5
    v = Constant((1.0, 2.0, 3.0))
    assert len(v) == 3 and v[1] == 2.0
    assert np.allclose(v.values(), [1, 2, 3])
    t = Constant(((1, 0), (0, 1)))
    assert t.value.shape == (2, 2)
