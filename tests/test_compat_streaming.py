"""Essay Appendix E streaming API compat names."""

import numpy as np

from lbaudiodetective_tpu import compat
from lbaudiodetective_tpu.streaming.runtime import StreamingDetective


def test_streaming_compat_lifecycle():
    det = StreamingDetective(chunk_size=1024)
    done = []
    compat.LBAudioDetectiveProcess(det, 1, done.append)
    rng = np.random.default_rng(80)
    det.process_samples((rng.standard_normal(2048) * 0.1).astype(np.float32))
    assert not done
    compat.LBAudioDetectivePauseProcessing(det)
    compat.LBAudioDetectiveResumeProcessing(det)
    det.process_samples((rng.standard_normal(4096) * 0.1).astype(np.float32))
    assert len(done) == 1
    fp = compat.LBAudioDetectiveStopProcessing(det)
    assert fp.num_subfingerprints >= 1
