// Streaming IQ ingest: a producer thread reads a raw rtl_sdr capture
// (uint8 interleaved I/Q, value-127 offset, octave/load_rtlsdr.m:8-13) in
// fixed-size blocks, decodes each to float32 planes, and keeps a ring of
// `depth` decoded blocks ahead of the consumer — so host file IO + decode
// overlap device compute, and memory stays O(block * depth) regardless of
// capture length (FileIQSource's whole-file decode is O(capture)).
//
// Wraps around at EOF like FileIQSource so finite captures can feed
// arbitrarily long sessions.  Plain C ABI, handle-based; bound via ctypes
// in kspecanal_tpu/io/native_iq.py.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Slot {
    std::vector<float> re, im;
    std::vector<uint8_t> raw;   // raw mode: undecoded interleaved bytes
    bool full = false;
};

struct IqStream {
    FILE* f = nullptr;
    size_t block = 0;           // samples per block
    size_t file_samples = 0;    // total complex samples in the file
    size_t pos = 0;             // producer position (samples)
    bool raw_mode = false;      // ring holds raw u8 blocks, no decode
    std::vector<Slot> ring;
    size_t head = 0, tail = 0;  // producer writes head, consumer reads tail
    size_t count = 0;           // full slots
    bool stop = false;
    std::mutex mu;
    std::condition_variable cv_prod, cv_cons;
    std::thread producer;
    std::vector<uint8_t> rawbuf;

    // Read 2*block interleaved bytes into dst, wrapping at EOF.
    bool read_bytes(uint8_t* dst) {
        size_t need = block;
        size_t got = 0;
        while (need > 0) {
            size_t avail = file_samples - pos;
            if (avail == 0) {
                if (fseek(f, 0, SEEK_SET) != 0) return false;
                pos = 0;
                avail = file_samples;
            }
            size_t take = need < avail ? need : avail;
            size_t nb = fread(dst + 2 * got, 1, 2 * take, f);
            if (nb != 2 * take) return false;
            pos += take;
            got += take;
            need -= take;
        }
        return true;
    }

    bool fill_block(Slot& s) {
        if (raw_mode) return read_bytes(s.raw.data());
        if (!read_bytes(rawbuf.data())) return false;
        for (size_t i = 0; i < block; ++i) {
            s.re[i] = static_cast<float>(rawbuf[2 * i]) - 127.0f;
            s.im[i] = static_cast<float>(rawbuf[2 * i + 1]) - 127.0f;
        }
        return true;
    }

    void run() {
        for (;;) {
            std::unique_lock<std::mutex> lk(mu);
            cv_prod.wait(lk, [&] { return stop || count < ring.size(); });
            if (stop) return;
            Slot& s = ring[head];
            lk.unlock();
            bool ok = fill_block(s);
            lk.lock();
            if (!ok) { stop = true; cv_cons.notify_all(); return; }
            s.full = true;
            head = (head + 1) % ring.size();
            ++count;
            cv_cons.notify_one();
        }
    }
};

}  // namespace

extern "C" {

static void* open_common(const char* path, size_t block_samples, int depth,
                         bool raw_mode, size_t start_sample) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return nullptr; }
    long bytes = ftell(f);
    if (bytes < 2 || fseek(f, 0, SEEK_SET) != 0) { fclose(f); return nullptr; }
    auto* h = new IqStream();
    h->f = f;
    h->block = block_samples;
    h->file_samples = static_cast<size_t>(bytes) / 2;
    // Resume mid-capture: a consumer reopening the stream (e.g. to switch
    // block size or raw mode) passes its logical position so the capture
    // does not silently rewind to the start.
    start_sample %= h->file_samples;
    if (start_sample != 0) {
        if (fseek(f, static_cast<long>(2 * start_sample), SEEK_SET) != 0) {
            fclose(f);
            delete h;
            return nullptr;
        }
        h->pos = start_sample;
    }
    h->raw_mode = raw_mode;
    h->ring.resize(depth > 0 ? depth : 4);
    for (auto& s : h->ring) {
        if (raw_mode) {
            s.raw.resize(2 * block_samples);
        } else {
            s.re.resize(block_samples);
            s.im.resize(block_samples);
        }
    }
    if (!raw_mode) h->rawbuf.resize(2 * block_samples);
    h->producer = std::thread(&IqStream::run, h);
    return h;
}

void* iqs_open(const char* path, size_t block_samples, int depth) {
    return open_common(path, block_samples, depth, false, 0);
}

// Raw-mode stream: the ring holds UNDECODED uint8 interleaved IQ blocks
// (2*block_samples bytes each) — for consumers that ship raw planes to
// the device and decode in-kernel (2 B/sample over the host link).
void* iqs_open_raw(const char* path, size_t block_samples, int depth) {
    return open_common(path, block_samples, depth, true, 0);
}

// Positioned opener: starts the producer at `start_sample` complex samples
// into the capture (mod file length).  `raw` selects the ring payload.
void* iqs_open_at(const char* path, size_t block_samples, int depth,
                  int raw, size_t start_sample) {
    return open_common(path, block_samples, depth, raw != 0, start_sample);
}

// Pop the next decoded block into re/im (block_samples floats each).
// Returns 1 on success, 0 when the stream is stopped/errored.
int iqs_read(void* handle, float* re, float* im) {
    auto* h = static_cast<IqStream*>(handle);
    std::unique_lock<std::mutex> lk(h->mu);
    h->cv_cons.wait(lk, [&] { return h->stop || h->count > 0; });
    if (h->count == 0) return 0;  // stopped with nothing buffered
    Slot& s = h->ring[h->tail];
    std::memcpy(re, s.re.data(), h->block * sizeof(float));
    std::memcpy(im, s.im.data(), h->block * sizeof(float));
    s.full = false;
    h->tail = (h->tail + 1) % h->ring.size();
    --h->count;
    h->cv_prod.notify_one();
    return 1;
}

// Pop the next RAW block (2*block_samples interleaved uint8 bytes).
// Returns 1 on success, 0 when stopped/errored or not a raw-mode stream.
int iqs_read_raw(void* handle, uint8_t* out) {
    auto* h = static_cast<IqStream*>(handle);
    if (!h->raw_mode) return 0;
    std::unique_lock<std::mutex> lk(h->mu);
    h->cv_cons.wait(lk, [&] { return h->stop || h->count > 0; });
    if (h->count == 0) return 0;
    Slot& s = h->ring[h->tail];
    std::memcpy(out, s.raw.data(), 2 * h->block);
    s.full = false;
    h->tail = (h->tail + 1) % h->ring.size();
    --h->count;
    h->cv_prod.notify_one();
    return 1;
}

size_t iqs_file_samples(void* handle) {
    return static_cast<IqStream*>(handle)->file_samples;
}

void iqs_close(void* handle) {
    auto* h = static_cast<IqStream*>(handle);
    {
        std::lock_guard<std::mutex> lk(h->mu);
        h->stop = true;
    }
    h->cv_prod.notify_all();
    h->cv_cons.notify_all();
    if (h->producer.joinable()) h->producer.join();
    fclose(h->f);
    delete h;
}

}  // extern "C"
