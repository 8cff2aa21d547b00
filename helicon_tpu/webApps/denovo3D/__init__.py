"""denovo3D web app: de-novo helical indexing + reconstruction.

The algorithmic layers live in helicon_tpu.denovo3d (solver/pipeline/
grid) and helicon_tpu.helix (simulation); the modules here keep the
reference's file layout (webApps/denovo3D/{pipeline,solver_linear_
regression,utils}.py) as thin facades, plus a Shiny Express app.
"""

from . import pipeline, solver_linear_regression, utils  # noqa: F401
