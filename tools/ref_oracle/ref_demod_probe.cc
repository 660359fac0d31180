// Physics probe: does the REFERENCE OFDM demodulator produce hard-decision
// errors at ZERO noise on long QAM16 frames over the 512-pilot plan
// (the deterministic ICI floor our analytic front-end shows)?
#include <cmath>
#include <cstdio>
#include <random>
#include <vector>

#include "ultra/ofdm.hpp"
#include "ultra/types.hpp"
#include "../src/protocol/frame_v2.hpp"

using namespace ultra;

int main(int argc, char** argv) {
    Modulation mod = Modulation::QAM16;
    CodeRate rate = CodeRate::R3_4;
    int trials = 4, nbytes = 400;
    for (int i = 1; i < argc; i++) {
        std::string a = argv[i];
        if (a == "--bytes" && i + 1 < argc) nbytes = std::stoi(argv[++i]);
        else if (a == "--trials" && i + 1 < argc) trials = std::stoi(argv[++i]);
        else if (a == "--mod" && i + 1 < argc) {
            std::string m = argv[++i];
            mod = m == "qam64" ? Modulation::QAM64
                : m == "qam256" ? Modulation::QAM256 : Modulation::QAM16;
        }
    }
    for (int t = 0; t < trials; t++) {
        std::mt19937 rng(52000 + 37 * t);
        Bytes payload(nbytes);
        for (auto& b : payload) b = (uint8_t)(rng() & 0xFF);
        protocol::v2::DataFrame frame = protocol::v2::DataFrame::makeData(
            "AA1AA", "BB2BB", (uint16_t)t, payload, rate);
        Bytes ser = frame.serialize();
        auto encs = protocol::v2::encodeFrameWithLDPC(ser, rate);
        Bytes enc;
        for (auto& e : encs) enc.insert(enc.end(), e.begin(), e.end());

        ModemConfig cfg;
        cfg.modulation = mod;
        cfg.use_pilots = true;
        OFDMModulator m(cfg);
        Samples pre = m.generatePreamble();
        Samples data = m.modulate(ByteSpan(enc.data(), enc.size()), mod);
        std::vector<float> stream(2400, 0.0f);
        stream.insert(stream.end(), pre.begin(), pre.end());
        stream.insert(stream.end(), data.begin(), data.end());
        stream.insert(stream.end(), 8000, 0.0f);

        OFDMDemodulator d(cfg);
        std::vector<float> soft;
        for (size_t j = 0; j < stream.size(); j += 960) {
            size_t len = std::min<size_t>(960, stream.size() - j);
            if (d.process(SampleSpan(stream.data() + j, len))) {
                auto s2 = d.getSoftBits();
                soft.insert(soft.end(), s2.begin(), s2.end());
            }
        }
        { auto s2 = d.getSoftBits();
          soft.insert(soft.end(), s2.begin(), s2.end()); }
        size_t nbits = (size_t)encs.size() * 648;
        size_t have = soft.size();
        size_t errs = 0, cmp = std::min(nbits, have);
        size_t first_err = (size_t)-1;
        for (size_t i = 0; i < cmp; i++) {
            int txbit = (enc[i / 8] >> (7 - (i % 8))) & 1;
            int rxbit = soft[i] < 0.0f ? 1 : 0;
            if (txbit != rxbit) {
                if (first_err == (size_t)-1) first_err = i;
                errs++;
            }
        }
        printf("trial %d: cw=%zu soft=%zu cmp=%zu sign_errs=%zu first@%zd\n",
               t, encs.size(), have, cmp, errs, (ssize_t)first_err);
        fflush(stdout);
    }
    return 0;
}
