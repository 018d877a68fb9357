"""API-contract tests mirroring the reference's handle-lifecycle and header
validation suites (test/linne_encoder, test/linne_decoder, SURVEY.md §4)."""

import numpy as np
import pytest

from linne_tpu.codec.decoder import Decoder
from linne_tpu.codec.params import (
    DecoderConfig,
    EncodeParameter,
    EncoderConfig,
)
from linne_tpu.constants import (
    CH_PROCESS_MS,
    CODEC_VERSION,
    FORMAT_VERSION,
    HEADER_SIZE,
)
from linne_tpu.exact.encoder import ExactEncoder
from linne_tpu.format.header import FormatError, LinneHeader


class TestEncoderConfig:
    def test_defaults_valid(self):
        EncoderConfig().validate()

    @pytest.mark.parametrize("field,value", [
        ("max_num_channels", 0),
        ("max_num_samples_per_block", 0),
        ("max_num_layers", 0),
        ("max_num_parameters_per_layer", 0),
    ])
    def test_zero_fields_rejected(self, field, value):
        cfg = EncoderConfig()
        setattr(cfg, field, value)
        with pytest.raises(ValueError):
            cfg.validate()

    def test_block_must_exceed_order(self):
        cfg = EncoderConfig(max_num_samples_per_block=64,
                            max_num_parameters_per_layer=128)
        with pytest.raises(ValueError):
            cfg.validate()


class TestEncodeParameter:
    def _base(self, **kw):
        d = dict(num_channels=2, bits_per_sample=16, sampling_rate=44100)
        d.update(kw)
        return EncodeParameter(**d)

    def test_valid(self):
        self._base().validate_against(EncoderConfig())

    @pytest.mark.parametrize("kw", [
        dict(num_channels=0),
        dict(num_channels=99),
        dict(bits_per_sample=0),
        dict(sampling_rate=0),
        dict(num_samples_per_block=0),
        dict(preset=8),
        dict(preset=-1),
        dict(ch_process_method=7),
        dict(num_channels=1, ch_process_method=CH_PROCESS_MS),
        dict(num_samples_per_block=100),  # <= max layer order for preset 5
    ])
    def test_invalid_rejected(self, kw):
        param = self._base(**kw)
        if "num_samples_per_block" in kw and kw["num_samples_per_block"] == 100:
            param.preset = 5  # layer order 128 > 100
        with pytest.raises(ValueError):
            param.validate_against(EncoderConfig())

    def test_encode_before_set_parameter(self):
        enc = ExactEncoder()
        with pytest.raises(RuntimeError):
            enc.encode_whole([np.zeros(16, np.int32)], 16)


class TestHeader:
    def _header(self, **kw):
        d = dict(num_channels=2, num_samples=1000, sampling_rate=44100,
                 bits_per_sample=16, num_samples_per_block=4096, preset=0,
                 ch_process_method=1)
        d.update(kw)
        return LinneHeader(**d)

    def test_roundtrip(self):
        h = self._header()
        h2 = LinneHeader.unpack(h.pack())
        assert h2.num_channels == 2
        assert h2.num_samples == 1000
        assert h2.sampling_rate == 44100
        assert h2.bits_per_sample == 16
        assert h2.num_samples_per_block == 4096
        assert h2.preset == 0
        assert h2.ch_process_method == 1
        assert h2.format_version == FORMAT_VERSION
        assert h2.codec_version == CODEC_VERSION

    def test_size(self):
        assert len(self._header().pack()) == HEADER_SIZE

    def test_version_strictness(self):
        data = bytearray(self._header().pack())
        data[7] ^= 1  # format version
        with pytest.raises(FormatError):
            LinneHeader.unpack(bytes(data))
        data = bytearray(self._header().pack())
        data[11] ^= 1  # codec version
        with pytest.raises(FormatError):
            LinneHeader.unpack(bytes(data))

    @pytest.mark.parametrize("mutate", [
        lambda h: setattr(h, "num_channels", 0),
        lambda h: setattr(h, "num_samples", 0),
        lambda h: setattr(h, "sampling_rate", 0),
        lambda h: setattr(h, "bits_per_sample", 0),
        lambda h: setattr(h, "num_samples_per_block", 0),
        lambda h: setattr(h, "preset", 9),
        lambda h: setattr(h, "ch_process_method", 2),
    ])
    def test_invalid_fields(self, mutate):
        h = self._header()
        mutate(h)
        with pytest.raises(FormatError):
            h.pack()

    def test_ms_mono_rejected(self):
        with pytest.raises(FormatError):
            self._header(num_channels=1, ch_process_method=1).pack()


class TestDecoderContracts:
    def test_decode_block_before_header(self):
        dec = Decoder()
        with pytest.raises(RuntimeError):
            dec.decode_block(b"\xff\xff" + b"\x00" * 20)

    def test_capacity_checks(self):
        h = LinneHeader(num_channels=8, num_samples=100, sampling_rate=44100,
                        bits_per_sample=16, num_samples_per_block=4096,
                        preset=7, ch_process_method=1)
        dec = Decoder(DecoderConfig(max_num_channels=2))
        with pytest.raises(FormatError):
            dec.set_header(h)
        dec = Decoder(DecoderConfig(max_num_parameters_per_layer=64))
        with pytest.raises(FormatError):
            dec.set_header(h)  # preset 7 needs order 128

    def test_bad_sync_code(self):
        h = LinneHeader(num_channels=1, num_samples=100, sampling_rate=44100,
                        bits_per_sample=16, num_samples_per_block=4096,
                        preset=0, ch_process_method=0)
        dec = Decoder()
        dec.set_header(h)
        with pytest.raises(FormatError):
            dec.decode_block(b"\x12\x34" + b"\x00" * 30)
