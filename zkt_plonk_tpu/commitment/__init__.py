from . import kzg
from .kzg import CommitterKey, VerifierKeyKZG
