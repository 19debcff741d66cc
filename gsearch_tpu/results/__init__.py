from .answer import ReqAnswer, write_answers
from .matcher import Matcher
