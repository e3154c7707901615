from .sparse import CSRMatrix  # noqa: F401
from .krylov import cg, bicgstab, gmres, jacobi_preconditioner  # noqa: F401
from .direct import dense_solve  # noqa: F401
from .newton import newton_solve  # noqa: F401
