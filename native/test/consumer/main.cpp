// External-consumer smoke: compiled ONLY against the installed tree via
// find_package(dlimgedit); proves the config module exports usable include
// paths and link interface.
#include <dlimgedit/dlimgedit.hpp>

#include <cstdio>

int main() {
    dlimg::initialize();
    bool cpu = dlimg::Environment::is_supported(dlimg::Backend::cpu);
    dlimg::Image img(dlimg::Extent{8, 6}, dlimg::Channels::rgba);
    for (size_t i = 0; i < img.size(); ++i) {
        img.pixels()[i] = uint8_t(i);
    }
    dlimg::ImageView view(img);
    std::printf("CONSUMER_OK cpu=%d size=%zu stride=%d\n", int(cpu),
                img.size(), view.stride);
    return view.stride == 8 * 4 && img.size() == 8 * 6 * 4 ? 0 : 1;
}
