from . import animator, forces
from .session import Session
