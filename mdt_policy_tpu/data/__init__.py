from .dataset import CalvinDataset, build_lang_indices, build_vision_indices
from .extract import extract_by_key
from .extract_embeddings import extract_embeddings
from .loader import BatchLoader, DualStreamLoader, Preprocessor, collate
from .windows import get_validation_window_size, max_window_for_index, sample_window_size
