from mft_tpu.core.episode import EpisodeSpec, support_labels, query_labels
